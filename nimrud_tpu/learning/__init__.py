from nimrud_tpu.learning import (
    classifiers, linear, metrics, persistence, rpt)

__all__ = ["classifiers", "linear", "metrics", "persistence", "rpt"]
