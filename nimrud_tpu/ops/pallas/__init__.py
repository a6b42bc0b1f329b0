from nimrud_tpu.ops.pallas import multiscale_kernel

__all__ = ["multiscale_kernel"]
