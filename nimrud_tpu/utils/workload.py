"""
The benchmark workload and serving-program helpers shared by bench.py
and the trace/HLO tooling under scripts/.

These exist so the scripts stay bit-identical by construction: the
trace scripts attribute device ops to source lines by matching
fusion.NNN names against an AOT-compiled module, which only works when
every script builds EXACTLY the same program (same cloud shapes, same
specs, same model configuration).
"""

import numpy as np

BENCH_N_POINTS = 1_000_000
BENCH_EDGES = (0.25, 0.5, 1.0)
BENCH_RADII = (0.5, 1.0, 2.0)


def make_bench_cloud(n=BENCH_N_POINTS, seed=0):
    """The 1M-point outdoor LiDAR-style scene (BASELINE.md section 6):
    ground plane, eight building walls, vegetation canopy."""
    rng = np.random.default_rng(seed)
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = [rng.random((n // 16, 3)) * [0.2, 12, 9]
             + [rng.random() * 90, rng.random() * 90, 0]
             for _ in range(8)]
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    cloud = np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]
    labels = np.concatenate([
        np.zeros(n // 2, np.int32),
        np.ones(8 * (n // 16), np.int32),
        np.full(n // 4, 2, np.int32)])[:n]
    return cloud, labels


def make_bench_model(cloud, backend="packed", precision="highest",
                     epochs=10, **kwargs):
    """The production serving configuration measured by bench.py."""
    from nimrud_tpu.pipeline import GeometryClassifier

    scaleset = [(edge, (radius,))
                for edge, radius in zip(BENCH_EDGES, BENCH_RADII)]
    return GeometryClassifier(
        scaleset, kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": epochs, "seed": 0},
        transfer_dtype="uint16", backend=backend, precision=precision,
        bounds=(cloud.min(0), cloud.max(0)), trim_entries=True,
        **kwargs)


def lower_predict(model, staged, with_proba=False):
    """AOT-lower the exact program `predict_staged` dispatches for this
    staged cloud (for compiled-HLO fetch / op-name attribution).

    Must mirror pipeline.predict_staged's call EXACTLY -- with_proba
    and chunk_slots are STATIC args that change the compiled program on
    the packed backend, and the trace tooling attributes device ops by
    matching fusion names against this lowering."""
    import jax
    import jax.numpy as jnp
    from nimrud_tpu import pipeline

    clf_kind, clf_params, clf_static = model._fused_classifier()
    return pipeline._fused_predict_step.lower(
        staged["query"],
        jnp.arange(staged["q_bucket"]) < staged["n_query"],
        staged["search"],
        jnp.arange(staged["s_bucket"]) < staged["n_search"],
        clf_params, staged["specs"], model.kind, None, model.precision,
        staged["n_query"], clf_kind, clf_static, staged["dequant"],
        staged.get("attributes"), model.vector_s_cap, model.backend,
        jax.default_backend() not in ("tpu", "axon"),
        with_proba=with_proba, chunk_slots=model.serving_chunk_slots)
