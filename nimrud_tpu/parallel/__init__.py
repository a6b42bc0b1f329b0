from nimrud_tpu.parallel import mesh, tiles

__all__ = ["mesh", "tiles"]
