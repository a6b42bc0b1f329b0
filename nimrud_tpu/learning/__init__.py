from nimrud_tpu.learning import classifiers, linear, metrics, rpt

__all__ = ["classifiers", "linear", "metrics", "rpt"]
