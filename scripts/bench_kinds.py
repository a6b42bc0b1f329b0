"""
Device cost of the non-minimal feature kinds: the bench workload (1M
points, 3 scales, production serving configuration) traced with
``kind="vector"`` (V_MSO, attribute means -- reference nimrud/
prototypes/mso.py:12-98) or ``kind="oriented"`` (OG_MSO, oriented
eigenvector features -- reference mso.py:1315-1420).  Everything except
the feature layout (and, for vector, the attribute columns) matches
scripts/bench_headline.py, so the window delta vs the headline is the
kind's on-device cost.

Usage: python scripts/bench_kinds.py {vector|oriented}

One kind per PROCESS: the relay degrades a process after its first
device->host read (the trace drain), so a second kind in the same
process would trace garbage.  Each run prints ONE JSON line, merges its
result into BENCH_VARIANTS.json (the committed prior-measurement store
bench.py embeds in its detail block), and hard-exits.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

TRACE_RUNS = 2
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS_PATH = os.path.join(HERE, "BENCH_VARIANTS.json")

T0 = time.perf_counter()


def note(msg):
    print(f"[bench_kinds +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def merge_variant(key, result):
    """Read-merge-write the committed variants store (one TPU process
    runs at a time on this box, so no lock is needed)."""
    store = {}
    if os.path.exists(VARIANTS_PATH):
        try:
            with open(VARIANTS_PATH) as handle:
                store = json.load(handle)
        except Exception:
            store = {}
    store[key] = result
    with open(VARIANTS_PATH, "w") as handle:
        json.dump(store, handle, indent=1, sort_keys=True)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "vector"
    assert kind in ("vector", "oriented"), kind

    import jax

    from nimrud_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from nimrud_tpu.utils.profiling import device_track_stats
    from nimrud_tpu.utils.workload import (
        BENCH_N_POINTS as N_POINTS, make_bench_cloud, make_bench_model)

    cloud, labels = make_bench_cloud()
    attrs = None
    if kind == "vector":
        # class-correlated attribute columns (intensity-like + noise),
        # so the classifier has signal through the attribute means
        rng = np.random.default_rng(3)
        attrs = np.stack(
            [labels + 0.05 * rng.standard_normal(len(labels)),
             rng.random(len(labels))], axis=1).astype(np.float32)
    model = make_bench_model(cloud, backend="packed", kind=kind)
    model.fit(cloud, labels, sample=100_000, attributes=attrs)
    note(f"fit done (kind={kind})")

    staged = model.stage(cloud, attributes=attrs)
    assert staged is not None, f"fused path missing for kind={kind}"
    out = model.predict_staged(staged, with_diag=True)
    jax.block_until_ready(out)                 # compile + settle
    note("predict compiled")
    t_prep = time.perf_counter() - T0

    trace_stats = {}
    try:
        trace_dir = tempfile.mkdtemp(prefix="nimrud_bench_kind_trace_")
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

    result = {
        "mode": f"{kind}_serving",
        "kind": kind,
        "attr_width": None if attrs is None else int(attrs.shape[1]),
        "n_points": N_POINTS,
        "scales": 3,
        "trace": trace_stats,
        "overflow_counters": diag,
        "counters_all_zero": all(v == 0 for v in diag.values()),
        "train_accuracy":
            None if accuracy is None else round(accuracy, 4),
        "prep_fit_compile_sec": round(t_prep, 1),
        "device": str(jax.devices()[0]),
        "measured": time.strftime("%Y-%m-%d"),
    }
    if "window_ms_per_step" in trace_stats:
        result["points_per_sec_device"] = round(
            N_POINTS / (trace_stats["window_ms_per_step"] / 1e3), 1)
        merge_variant(f"{kind}_serving", result)
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: relay-attached TPU processes can hang in teardown
    os._exit(0)


if __name__ == "__main__":
    main()
