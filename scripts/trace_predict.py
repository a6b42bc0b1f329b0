"""
Honest device-compute profile of the PRODUCTION serving step.

scripts/trace_compute.py traces the fused extraction kernels in
isolation; this script traces the whole single-dispatch predict program
(`GeometryClassifier.predict_staged`: device voxel downsample + tile
build + masked moments + layout + classifier + argmax) on the exact
bench.py workload and configuration, then prints the device window and
the top ops by device time so regressions are attributable.

Usage:  python scripts/trace_predict.py [repeats] [backend]

One run per process on the relay-attached TPU (the trace drain forces a
d2h that flips the process into the degraded mode; see CLAUDE.md).
"""

import json
import shutil
import sys
import tempfile

import numpy as np

from nimrud_tpu.utils.profiling import device_op_table, device_track_stats

N_POINTS = 1_000_000
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)


def make_cloud(n, rng):
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = [rng.random((n // 16, 3)) * [0.2, 12, 9]
             + [rng.random() * 90, rng.random() * 90, 0] for _ in range(8)]
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    cloud = np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]
    labels = np.concatenate([
        np.zeros(n // 2, np.int32),
        np.ones(8 * (n // 16), np.int32),
        np.full(n // 4, 2, np.int32)])[:n]
    return cloud, labels


def main():
    import jax
    from nimrud_tpu.pipeline import GeometryClassifier

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    precision = sys.argv[3] if len(sys.argv) > 3 else "highest"
    rng = np.random.default_rng(0)
    cloud, labels = make_cloud(N_POINTS, rng)
    scaleset = [(e, (r,)) for e, r in zip(EDGES, RADII)]

    model = GeometryClassifier(
        scaleset, kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 3, "seed": 0},
        transfer_dtype="uint16", backend=backend, precision=precision,
        bounds=(cloud.min(0), cloud.max(0)), trim_entries=True)
    model.fit(cloud, labels, sample=20_000)

    staged = model.stage(cloud)
    assert staged is not None, "fused path did not engage"
    jax.block_until_ready(model.predict_staged(staged))  # compile

    trace_dir = tempfile.mkdtemp(prefix="nimrud_trace_predict_")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(repeats):
            out = model.predict_staged(staged)
        jax.block_until_ready(out)
        int(out[0])                       # force real completion

    busy_us, window_us = device_track_stats(trace_dir)
    table = device_op_table(trace_dir, top=500)
    shutil.rmtree(trace_dir, ignore_errors=True)

    # attribute op names to source lines via the compiled HLO (the
    # remote compile service ignores --xla_dump_to; AOT as_text works)
    src_of = {}
    try:
        import re
        from nimrud_tpu import pipeline
        import jax.numpy as jnp
        clf_kind, clf_params, clf_static = model._fused_classifier()
        text = pipeline._fused_predict_step.lower(
            staged["query"],
            jnp.arange(staged["q_bucket"]) < staged["n_query"],
            staged["search"],
            jnp.arange(staged["s_bucket"]) < staged["n_search"],
            clf_params, staged["specs"], model.kind, None, model.precision,
            staged["n_query"], clf_kind, clf_static, staged["dequant"],
            None, model.vector_s_cap, model.backend,
            jax.default_backend() not in ("tpu", "axon")).compile(
            ).as_text()  # noqa
        pat = re.compile(
            r"%?([\w.\-]+) = .*?source_file=\"([^\"]+)\".*?"
            r"source_line=(\d+)")
        for line in text.splitlines():
            m = pat.search(line)
            if m:
                name, path, lineno = m.groups()
                src_of[name] = f"{path.split('/')[-1]}:{lineno}"
    except Exception as error:
        print("hlo attribution failed:", str(error)[:120])

    print(json.dumps({
        "repeats": repeats,
        "backend": backend,
        "precision": precision,
        "n_points": N_POINTS,
        "window_ms_total": round(window_us / 1e3, 3),
        "window_ms_per_predict": round(window_us / 1e3 / repeats, 3),
        "busy_ms_total": round(busy_us / 1e3, 3),
        "points_per_sec_device": round(
            N_POINTS / (window_us / 1e6 / repeats), 1),
        "device": str(jax.devices()[0]),
    }))
    for ms, n, name in table[:18]:
        print(f"{ms:10.1f} ms  n={n:6d}  {name[:40]:40s} "
              f"{src_of.get(name, '')}")

    # aggregate device time by source line
    if src_of:
        import collections
        by_src = collections.Counter()
        for ms, n, name in table:
            by_src[src_of.get(name, "<unattributed>")] += ms
        print("---- by source line ----")
        for src, ms in by_src.most_common(20):
            print(f"{ms:10.1f} ms  {src}")


if __name__ == "__main__":
    main()
