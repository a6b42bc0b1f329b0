"""
Model persistence: save/load fitted classifiers as transparent
npz + JSON (no pickles), so trained models survive sessions the same way
features survive in the CloudArchive.

The reference had no model persistence at all -- classifiers were
refit per workflow run from stored features (reference:
nimrud/prototypes/apc.py multiclass_self).  This keeps that refit-from-
features capability (the archive) and adds proper model checkpointing
for the TPU-native classifiers.
"""

import json
import os

import numpy as np

from nimrud_tpu.learning.linear import SoftmaxClassifier
from nimrud_tpu.learning.rpt import RPTEnsemble


def save_model(model, path):
    """Save a fitted SoftmaxClassifier or RPTEnsemble to ``path``.npz."""
    path = os.fspath(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    if isinstance(model, SoftmaxClassifier):
        if model.params is None:
            raise ValueError("model is not fitted")
        arrays = {
            "w": np.asarray(model.params["w"]),
            "b": np.asarray(model.params["b"]),
            "mean": np.asarray(model.mean_),
            "scale": np.asarray(model.scale_),
        }
        meta = {
            "kind": "linear",
            "n_classes": int(model.n_classes_),
            "standardize": bool(model.standardize),
        }
    elif isinstance(model, RPTEnsemble):
        if model._tables is None:
            raise ValueError("model is not fitted")
        # dense_blk* are DERIVED (the 3-levels-per-gather walk table,
        # 7x the vec table's bytes, plus its sentinel-ized shallow
        # matmul slices); rebuilt on load instead
        arrays = {key: np.asarray(value)
                  for key, value in model._tables.items()
                  if not key.startswith("dense_blk")}
        meta = {
            "kind": "rpte",
            "numlabs": int(model.numlabs),
            "dim": int(model.dim),
            "max_depth": int(model.max_depth_),
            "d_func": model.d_func,
            "n_estimators": int(model.n_estimators),
            "onepass": int(model.onepass),
        }
    else:
        raise ValueError(f"cannot persist {type(model).__name__}")

    np.savez(path, **arrays)
    with open(path + ".json", "w") as handle:
        json.dump(meta, handle)
    return path


def load_model(path):
    """Load a model saved by :func:`save_model`."""
    path = os.fspath(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with open(path + ".json") as handle:
        meta = json.load(handle)
    arrays = dict(np.load(path))

    if meta["kind"] == "linear":
        model = SoftmaxClassifier(standardize=meta["standardize"])
        model.params = {"w": arrays["w"], "b": arrays["b"]}
        model.mean_ = arrays["mean"]
        model.scale_ = arrays["scale"]
        model.n_classes_ = meta["n_classes"]
        return model

    if meta["kind"] == "rpte":
        import jax.numpy as jnp
        from nimrud_tpu.learning.rpt import add_blocked_tables
        model = RPTEnsemble(
            d_func=meta["d_func"], n_estimators=meta["n_estimators"],
            onepass=meta["onepass"])
        model._tables = add_blocked_tables(
            {key: jnp.asarray(value) for key, value in arrays.items()})
        model.numlabs = meta["numlabs"]
        model.dim = meta["dim"]
        model.max_depth_ = meta["max_depth"]
        return model

    raise ValueError(f"unknown model kind {meta['kind']!r}")


def save_pipeline(model, path):
    """
    Persist a fitted :class:`nimrud_tpu.pipeline.GeometryClassifier` --
    scaleset, layout kind, transfer/serving configuration AND the fitted
    classifier -- as npz + JSON, so a serving process can load the whole
    production model without refitting.
    """
    path = os.fspath(path)
    save_model(model.classifier, path)
    config = {
        "pipeline": {
            "scaleset": [[edge, list(radii)]
                         for edge, radii in model.scaleset],
            "kind": model.kind,
            "exclude_radius": model.exclude_radius,
            "method": model.method,
            "chunk_size": model.chunk_size,
            "transfer_dtype": model.transfer_dtype,
            "vector_s_cap": model.vector_s_cap,
            "trim_entries": model.trim_entries,
            "bounds": None if model.bounds is None else
                      [model.bounds[0].tolist(), model.bounds[1].tolist()],
        }
    }
    if not path.endswith(".npz"):
        path = path + ".npz"
    with open(path + ".json") as handle:
        meta = json.load(handle)
    meta.update(config)
    with open(path + ".json", "w") as handle:
        json.dump(meta, handle)
    return path


def load_pipeline(path):
    """Load a model saved by :func:`save_pipeline`."""
    from nimrud_tpu.pipeline import GeometryClassifier
    path = os.fspath(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    with open(path + ".json") as handle:
        meta = json.load(handle)
    if "pipeline" not in meta:
        raise ValueError(f"{path} was not saved with save_pipeline")
    cfg = meta["pipeline"]
    classifier = load_model(path)
    return GeometryClassifier(
        cfg["scaleset"], kind=cfg["kind"], classifier=classifier,
        exclude_radius=cfg["exclude_radius"], method=cfg["method"],
        chunk_size=cfg["chunk_size"],
        transfer_dtype=cfg["transfer_dtype"],
        vector_s_cap=cfg["vector_s_cap"],
        trim_entries=cfg["trim_entries"],
        bounds=None if cfg["bounds"] is None else tuple(cfg["bounds"]))
