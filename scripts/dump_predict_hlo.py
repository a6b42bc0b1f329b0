"""
Dump the optimized HLO of the production serving program so trace op
names (fusion.NNN) can be attributed to source operations.  The remote
compile service ignores --xla_dump_to, but AOT `compile().as_text()`
fetches the optimized module.

Usage: python scripts/dump_predict_hlo.py [backend] [out_path]
"""

import sys

import numpy as np


def main():
    import jax
    from nimrud_tpu import pipeline
    from nimrud_tpu.pipeline import GeometryClassifier
    import jax.numpy as jnp

    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/predict_hlo.txt"

    n = 1_000_000
    rng = np.random.default_rng(0)
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = [rng.random((n // 16, 3)) * [0.2, 12, 9]
             + [rng.random() * 90, rng.random() * 90, 0] for _ in range(8)]
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    cloud = np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]
    labels = (cloud[:, 2] > 1).astype(np.int32)

    # EXACTLY the trace_predict.py configuration: same shapes and specs
    # mean the same optimized module, so fusion.NNN names line up with
    # the trace's op table
    model = GeometryClassifier(
        [(0.25, (0.5,)), (0.5, (1.0,)), (1.0, (2.0,))],
        kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 3, "seed": 0},
        transfer_dtype="uint16", backend=backend,
        bounds=(cloud.min(0), cloud.max(0)), trim_entries=True)
    model.fit(cloud, labels, sample=20_000)
    staged = model.stage(cloud)
    assert staged is not None

    clf_kind, clf_params, clf_static = model._fused_classifier()
    lowered = pipeline._fused_predict_step.lower(
        staged["query"],
        jnp.arange(staged["q_bucket"]) < staged["n_query"],
        staged["search"],
        jnp.arange(staged["s_bucket"]) < staged["n_search"],
        clf_params, staged["specs"], model.kind, None, "highest",
        staged["n_query"], clf_kind, clf_static, staged["dequant"],
        None, model.vector_s_cap, model.backend,
        jax.default_backend() not in ("tpu", "axon"))
    text = lowered.compile().as_text()
    with open(out_path, "w") as handle:
        handle.write(text)
    print("wrote", out_path, len(text), "bytes")


if __name__ == "__main__":
    main()
