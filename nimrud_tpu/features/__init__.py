from nimrud_tpu.features import layouts, minimal, multiscale

__all__ = ["layouts", "minimal", "multiscale"]
