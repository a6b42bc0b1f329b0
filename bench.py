"""
Benchmark: end-to-end multiscale feature extraction + classification
throughput on one chip.

Workload (BASELINE.md / SURVEY.md section 6): a 1M-point outdoor
LiDAR-style cloud (ground plane, building walls, vegetation canopy),
three analysis scales (voxel edges 0.25/0.5/1.0 m, radii 0.5/1.0/2.0 m),
minimal feature layout, softmax classification.  The measured program is
the full production serving step for a staged cloud: device voxel
binning + tile-grid build + feature extraction + classification, one
compiled dispatch; only int32 labels ever leave the device.

MEASUREMENT HONESTY: on this relay-attached TPU, host wall clocks are
meaningless -- jax.block_until_ready returns without awaiting dispatched
device work (a multi-extract chain "completes" in microseconds), so
dispatch-side step times wildly overstate throughput.  The headline is
therefore taken from the DEVICE TRACE: jax.profiler records per-op
start/duration on the device's own timeline, and the serving step's
window (first op start to last op end) is true device time.  Dispatch
walls and the streamed rate are still reported in the detail block.

Baseline: the reference's minimal pipeline runs ~5,000 points/sec *per
scale* on one CPU core (reference: nimrud/minimal/README.md:4), i.e.
~1,667 points/sec end-to-end at three scales.  vs_baseline is measured
against that.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/sec", "vs_baseline": N}
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

from nimrud_tpu.utils.workload import (
    BENCH_RADII as RADII, BENCH_N_POINTS as N_POINTS,
    make_bench_cloud, make_bench_model, roofline_payload,
    roofline_rates)

BASELINE_PTS_PER_SEC = 5000.0 / len(RADII)
WARMUP_RUNS = 1
TIMED_RUNS = 2
TRACE_RUNS = 2


def _bench_large():
    """BASELINE config 3 (10M+ points) in its OWN process -- the relay
    degrades a process after its first d2h, so the 10M trace needs
    fresh relay state; runs BEFORE this process touches the TPU.
    Set NIMRUD_BENCH_SKIP_LARGE=1 to skip (e.g. for quick reruns)."""
    if os.environ.get("NIMRUD_BENCH_SKIP_LARGE"):
        return {"skipped": True}
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_large.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) \
        + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=2400, env=env)
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": (proc.stderr or "no output")[-200:]}
    except Exception as error:      # pragma: no cover - relay flakiness
        return {"error": str(error)[:200]}


def _bench_designated():
    """Designated-search streamed serving (the reference's production
    mode: one staged search asset, clouds stream against it) in its OWN
    process, before this process touches the TPU.  Set
    NIMRUD_BENCH_SKIP_DESIGNATED=1 to skip."""
    if os.environ.get("NIMRUD_BENCH_SKIP_DESIGNATED"):
        return {"skipped": True}
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "bench_designated.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__)) \
        + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            timeout=1800, env=env)
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": (proc.stderr or "no output")[-200:]}
    except Exception as error:      # pragma: no cover - relay flakiness
        return {"error": str(error)[:200]}


def main():
    import jax

    large = _bench_large()
    designated = _bench_designated()

    cloud, labels = make_bench_cloud()
    # production serving configuration: quantized uint16 uploads, fixed
    # site bounds (one compiled program for the whole stream), entry
    # capacity sized from fit-time occupancy, and the packed-candidate
    # Pallas moment kernel (trace-measured ~13x the XLA candidate-table
    # path on v5e for this workload).  If the packed program fails on
    # this device (remote-compile flakiness, an unvalidated kernel
    # layout), fall back to the span backend, then XLA -- a slower
    # measured number beats a crashed benchmark.
    backend_used = None
    model = None
    for candidate in ("packed", "pallas", "xla"):
        try:
            model = make_bench_model(cloud, backend=candidate)
            # train on a subsample, entirely on device (no transfers at
            # all -- a single device->host read flips this
            # environment's remote relay into a pathological slow mode,
            # so the pipeline is transfer-disciplined: uploads + compute
            # in the hot loop, label downloads batched at the end)
            model.fit(cloud, labels, sample=100_000)
            for _ in range(WARMUP_RUNS):
                jax.block_until_ready(model.predict_device(cloud))
            backend_used = candidate
            break
        except Exception as error:   # pragma: no cover - device issues
            print(f"# backend {candidate!r} failed: "
                  f"{str(error)[:160]}", file=sys.stderr, flush=True)
    if model is None or backend_used is None:
        raise SystemExit("no serving backend could run the workload")

    # dispatch-side step walls (host clock; NOT device time on this
    # relay -- kept for round-over-round continuity)
    times = []
    for _ in range(TIMED_RUNS):
        start = time.perf_counter()
        labels_dev = model.predict_device(cloud)
        jax.block_until_ready(labels_dev)
        times.append(time.perf_counter() - start)

    # host prep + upload of one staged cloud
    start = time.perf_counter()
    staged = model.stage(cloud)
    t_stage = time.perf_counter() - start
    jax.block_until_ready(staged["query"])
    t_upload = time.perf_counter() - start - t_stage

    # streamed serving: uploads overlap compute across a stream
    n_stream = 4
    start = time.perf_counter()
    outs = list(model.predict_stream(cloud for _ in range(n_stream)))
    jax.block_until_ready(outs)
    t_stream = (time.perf_counter() - start) / n_stream

    # THE MEASUREMENT: device trace of the full serving step.  Runs
    # before any d2h -- the first host read permanently degrades this
    # relay process.  The trace drain itself forces one tiny d2h at the
    # end, after the traced ops have executed.
    trace_stats = None
    try:
        from nimrud_tpu.utils.profiling import device_track_stats
        trace_dir = tempfile.mkdtemp(prefix="nimrud_bench_trace_")
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(TRACE_RUNS):
                out = model.predict_staged(staged)
            jax.block_until_ready(out)
            int(out[0])                   # force real completion
        busy_us, window_us = device_track_stats(trace_dir)
        shutil.rmtree(trace_dir, ignore_errors=True)
        trace_stats = {
            "window_ms_per_step": round(window_us / 1e3 / TRACE_RUNS, 3),
            "busy_ms_per_step": round(busy_us / 1e3 / TRACE_RUNS, 3),
            "traced_steps": TRACE_RUNS,
        }
        labels_dev = out
    except Exception as error:      # pragma: no cover - relay flakiness
        trace_stats = {"trace_error": str(error)[:160]}

    # one batched label download at the end (reported separately)
    start = time.perf_counter()
    try:
        predicted = np.asarray(labels_dev)
        stages = {"labels_d2h_once":
                  round(time.perf_counter() - start, 3)}
        accuracy = float((predicted == labels).mean())
    except Exception as error:
        stages = {"labels_d2h_error": str(error)[:120]}
        accuracy = None
    stages.update({
        "host_prep": round(t_stage, 3),
        "upload_dispatch": round(t_upload, 3),
        "dispatch_walls_sec": [round(t, 3) for t in times],
        "streamed_per_cloud_dispatch": round(t_stream, 3),
    })

    # auditable bytes-moved model of the step (lower bound), so the
    # "primitive floor" claim is checkable: payload GB/s vs peak HBM
    roofline = None
    try:
        roofline = roofline_payload(model, staged)
    except Exception as error:      # pragma: no cover
        roofline = {"error": str(error)[:120]}

    if trace_stats and "window_ms_per_step" in trace_stats:
        step_sec = trace_stats["window_ms_per_step"] / 1e3
        rate = N_POINTS / step_sec
        metric = ("serving step device time (profiler trace), 1M-point "
                  "cloud, 3 scales, single chip")
        semantics = "device-trace window per serving step"
        if roofline and "bytes_total" in roofline:
            import jax as _jax
            roofline = roofline_rates(
                roofline, trace_stats["window_ms_per_step"],
                str(_jax.devices()[0]))
    else:
        rate = N_POINTS / min(times)
        metric = ("end-to-end dispatch-side step wall, 1M-point cloud, "
                  "3 scales, single chip (trace unavailable)")
        semantics = "dispatch-side on relay-attached TPU"

    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "points/sec",
        "vs_baseline": round(rate / BASELINE_PTS_PER_SEC, 1),
        "detail": {
            "trace": trace_stats,
            "roofline": roofline,
            "designated_search_stream": designated,
            "large_scale_10m": large,
            "stages_sec": stages,
            "n_points": N_POINTS,
            "scales": list(RADII),
            "train_accuracy":
                None if accuracy is None else round(accuracy, 4),
            "device": str(jax.devices()[0]),
            "backend": backend_used,
            "timing_semantics": semantics,
        },
    }))


if __name__ == "__main__":
    main()
