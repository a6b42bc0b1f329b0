"""
The flagship classifier inside the traced serving step: the bench
workload (1M points, 3 scales, production configuration) served with
``classifier="rpte"`` -- the random-projection-tree ensemble, the
reference's signature classifier (reference: nimrud/prototypes/ml.py
:11-429), here as dense direct-index tables walked level-synchronously
inside the single fused dispatch.

Everything except the classifier is identical to scripts/
bench_headline.py, so (window here) - (headline window) is the
on-device cost of the forest walk vs the softmax.

Runs standalone in its OWN process (bench.py is a pure orchestrator);
prints ONE JSON line and hard-exits.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

TRACE_RUNS = 2

T0 = time.perf_counter()


def note(msg):
    print(f"[bench_rpte +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax

    # persistent XLA compile cache: remote relay compiles are
    # 90-500 s and dominate the stage budget; warm hits are ~0.1 s
    from nimrud_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from nimrud_tpu.utils.profiling import device_track_stats
    from nimrud_tpu.utils.workload import (
        BENCH_N_POINTS as N_POINTS, make_bench_cloud, make_bench_model)

    cloud, labels = make_bench_cloud()
    model = make_bench_model(cloud, backend="packed", classifier="rpte")
    # fit_device grows the forest from device features (no feature d2h)
    model.fit(cloud, labels, sample=100_000)
    note("fit done (rpte forest grown on device)")

    staged = model.stage(cloud)
    out = model.predict_staged(staged, with_diag=True)
    jax.block_until_ready(out)                 # compile + settle
    note("predict compiled")
    t_prep = time.perf_counter() - T0

    trace_stats = {}
    try:
        trace_dir = tempfile.mkdtemp(prefix="nimrud_bench_rpte_trace_")
        with jax.profiler.trace(trace_dir):
            for _ in range(TRACE_RUNS):
                out = model.predict_staged(staged, with_diag=True)
            jax.block_until_ready(out)
            int(out[0][0])                     # force real completion
        busy_us, window_us = device_track_stats(trace_dir)
        shutil.rmtree(trace_dir, ignore_errors=True)
        trace_stats = {
            "window_ms_per_step": round(window_us / 1e3 / TRACE_RUNS, 3),
            "busy_ms_per_step": round(busy_us / 1e3 / TRACE_RUNS, 3),
            "traced_steps": TRACE_RUNS,
        }
        note(f"traced: {trace_stats['window_ms_per_step']} ms/step")
    except Exception as error:                 # pragma: no cover
        trace_stats = {"trace_error": str(error)[:160]}

    labels_dev, diag = out
    diag = {k: int(v) for k, v in jax.device_get(diag).items()}
    accuracy = None
    try:
        predicted = np.asarray(labels_dev)[:N_POINTS]
        accuracy = float((predicted == labels).mean())
    except Exception:
        pass

    clf = model.classifier
    result = {
        "mode": "rpte_serving",
        "classifier": {
            "kind": "rpte",
            "n_estimators": clf.n_estimators,
            "d_func": clf.d_func,
        },
        "n_points": N_POINTS,
        "scales": 3,
        "trace": trace_stats,
        "overflow_counters": diag,
        "counters_all_zero": all(v == 0 for v in diag.values()),
        "train_accuracy":
            None if accuracy is None else round(accuracy, 4),
        "prep_fit_compile_sec": round(t_prep, 1),
    }
    if "window_ms_per_step" in trace_stats:
        result["points_per_sec_device"] = round(
            N_POINTS / (trace_stats["window_ms_per_step"] / 1e3), 1)
        result["device"] = str(jax.devices()[0])
        result["measured"] = time.strftime("%Y-%m-%d")
        # persist into the committed variants store so bench.py can
        # fall back to this as a labeled prior measurement when the
        # live rpte stage doesn't fit the driver's deadline
        from bench_kinds import merge_variant
        merge_variant("rpte_serving", result)
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: relay-attached TPU processes can hang in teardown
    os._exit(0)


if __name__ == "__main__":
    main()
