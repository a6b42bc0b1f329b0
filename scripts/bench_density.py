"""
BASELINE config 4: the batched eigensolver / masked-gather sweep across
CONTRASTING NEIGHBORHOOD DENSITY regimes -- a dense urban core vs a
sparse vegetation scan (reference framing: variable neighbor counts
under masked gathers; BASELINE.json configs[3]).

Two 1M-point synthetic regimes, same production serving configuration
and scale set as the headline bench:

  urban -- a compact 45x45 m city block: ground at ~8x headline
           density, 24 walls, parapet clutter.  Neighborhoods are FAT
           (hundreds of candidates per query at the 2 m scale) and
           uniform-ish.
  veg   -- a 220x220 m sparse vegetation scan: thin ground returns +
           scattered canopy blobs.  Neighborhoods are THIN and heavy-
           tailed (most voxels near-empty, blob cores dense).

For each regime this records the traced serving-step window, device
throughput, the multi-bucket candidate caps the host mirror chose
(ops/span_host.candidate_caps_split -- the machinery built for exactly
this contrast), static-plan occupancy (entry_fill / q_slot_fill), and
the overflow counters (must be zero: the caps are sized per cloud).

Usage: python scripts/bench_density.py {urban|veg}

One regime per PROCESS (the relay degrades a process after its first
device->host read).  Each run prints ONE JSON line, merges its result
into BENCH_DENSITY.json (committed; embedded by bench.py's detail
block), and hard-exits.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

TRACE_RUNS = 2
N_POINTS = 1_000_000
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STORE_PATH = os.path.join(HERE, "BENCH_DENSITY.json")

T0 = time.perf_counter()


def note(msg):
    print(f"[bench_density +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def make_regime_cloud(regime, n=N_POINTS, seed=11):
    """Two density extremes of the same outdoor-LiDAR vocabulary."""
    rng = np.random.default_rng(seed)
    if regime == "urban":
        # 45x45 m core: dense ground + 24 walls + parapet clutter
        ground = rng.random((n // 2, 3)) * [45, 45, 0.12]
        walls = [rng.random((n // 64, 3)) * [0.25, 9, 12]
                 + [rng.random() * 40, rng.random() * 40, 0]
                 for _ in range(24)]
        clutter = rng.normal([22, 22, 12.5], [12, 12, 0.4],
                             (n - n // 2 - 24 * (n // 64), 3))
        cloud = np.vstack([ground, *walls, clutter])
        labels = np.concatenate([
            np.zeros(n // 2, np.int32),
            np.ones(24 * (n // 64), np.int32),
            np.full(len(clutter), 2, np.int32)])
    elif regime == "veg":
        # 220x220 m sparse scan: thin ground + 40 canopy blobs
        ground = rng.random((n // 2, 3)) * [220, 220, 0.3]
        blobs = [rng.normal(
            [rng.random() * 200 + 10, rng.random() * 200 + 10,
             5 + rng.random() * 6],
            [3.5, 3.5, 2.5], (n // 80, 3))
            for _ in range(40)]
        cloud = np.vstack([ground, *blobs])[:n]
        labels = np.concatenate([
            np.zeros(n // 2, np.int32),
            np.full(40 * (n // 80), 1, np.int32)])[:n]
    else:
        raise SystemExit(f"unknown regime {regime!r}")
    order = rng.permutation(len(cloud))
    return cloud[order].astype(np.float32), labels[order]


def merge_result(key, result):
    store = {}
    if os.path.exists(STORE_PATH):
        try:
            with open(STORE_PATH) as handle:
                store = json.load(handle)
        except Exception:
            store = {}
    store[key] = result
    with open(STORE_PATH, "w") as handle:
        json.dump(store, handle, indent=1, sort_keys=True)


def main():
    regime = sys.argv[1] if len(sys.argv) > 1 else "urban"

    import jax

    from nimrud_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from nimrud_tpu.features import multiscale
    from nimrud_tpu.utils.profiling import device_track_stats
    from nimrud_tpu.utils.workload import (
        BENCH_EDGES, BENCH_RADII, make_bench_model)

    cloud, labels = make_regime_cloud(regime)
    model = make_bench_model(cloud, backend="packed")
    model.fit(cloud, labels, sample=100_000)
    note(f"fit done ({regime})")

    staged = model.stage(cloud)
    out = model.predict_staged(staged, with_diag=True)
    jax.block_until_ready(out)                 # compile + settle
    note("predict compiled")
    t_prep = time.perf_counter() - T0

    trace_stats = {}
    try:
        trace_dir = tempfile.mkdtemp(prefix="nimrud_bench_dens_trace_")
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

    # the chosen multi-bucket candidate caps, straight from the staged
    # band specs (span_host.candidate_caps_split picked them from this
    # cloud's measured per-entry candidate totals)
    cap_buckets = []
    for band in staged["specs"]:
        c_cap = band[5] if len(band) > 5 else None
        if isinstance(c_cap, tuple):
            caps, bounds = c_cap
            cap_buckets.append({"caps": [int(c) for c in caps],
                                "rank_bounds": [int(b) for b in bounds]})
        else:
            cap_buckets.append({"caps": None if c_cap is None
                                else [int(c_cap)], "rank_bounds": []})

    # static-plan occupancy (host mirror; no kernels run)
    scaleset = [(edge, (radius,))
                for edge, radius in zip(BENCH_EDGES, BENCH_RADII)]
    try:
        occupancy = [
            {k: row[k] for k in
             ("edge", "entry_fill", "q_slot_fill", "e_cap", "q_cap")
             if k in row}
            for row in multiscale.plan_report(
                cloud, cloud, scaleset, method="fused",
                tuning={"backend": "packed"})]
    except Exception as error:                 # pragma: no cover
        occupancy = {"error": str(error)[:120]}

    result = {
        "mode": f"density_{regime}",
        "regime": regime,
        "n_points": N_POINTS,
        "scales": 3,
        "site_extent_m": [round(float(x), 1)
                          for x in (cloud.max(0) - cloud.min(0))],
        "trace": trace_stats,
        "cap_buckets_per_band": cap_buckets,
        "plan_occupancy": occupancy,
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
        merge_result(regime, result)
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: relay-attached TPU processes can hang in teardown
    os._exit(0)


if __name__ == "__main__":
    main()
