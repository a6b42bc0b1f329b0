from nimrud_tpu.utils import (
    generic, geometry, memory, point_clouds, profiling)

__all__ = ["generic", "geometry", "memory", "point_clouds", "profiling"]
