from nimrud_tpu.workflows import datasets, features, sweep, train, viz

__all__ = ["datasets", "features", "sweep", "train", "viz"]
