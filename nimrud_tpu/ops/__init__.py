from nimrud_tpu.ops import (
    device_grid, eigen, grid, interp, moments, neighbors, packing,
    unique)

__all__ = ["device_grid", "eigen", "grid", "interp", "moments",
           "neighbors", "packing", "unique"]
