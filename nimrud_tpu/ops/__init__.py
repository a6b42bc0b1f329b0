from nimrud_tpu.ops import eigen, moments, packing, unique

__all__ = ["eigen", "moments", "packing", "unique"]
