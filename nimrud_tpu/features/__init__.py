from nimrud_tpu.features import knn, layouts, minimal, multiscale

__all__ = ["knn", "layouts", "minimal", "multiscale"]
