from nimrud_tpu.ops import eigen, grid, moments, packing, unique

__all__ = ["eigen", "grid", "moments", "packing", "unique"]
