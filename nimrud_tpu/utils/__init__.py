from nimrud_tpu.utils import generic, geometry, point_clouds, profiling

__all__ = ["generic", "geometry", "point_clouds", "profiling"]
