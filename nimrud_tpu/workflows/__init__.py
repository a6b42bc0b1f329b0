from nimrud_tpu.workflows import features, train, viz

__all__ = ["features", "train", "viz"]
