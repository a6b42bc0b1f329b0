"""
The HEADLINE benchmark measurement: end-to-end multiscale feature
extraction + classification throughput on one chip, 1M-point cloud,
three scales, production serving configuration (BASELINE.md section 6).

Runs standalone in its OWN process: bench.py is a pure orchestrator
that never touches the TPU (this relay's processes can hang in
teardown after heavy use -- round 4's bench timed out with nothing
printed because sub-benchmarks were waited on past their JSON).  This
script prints ONE JSON line and then hard-exits (os._exit) so a
teardown hang can never eat the orchestrator's budget.

MEASUREMENT HONESTY: on this relay-attached TPU, host wall clocks are
meaningless -- jax.block_until_ready returns without awaiting dispatched
device work, so dispatch-side step times wildly overstate throughput.
The headline is therefore taken from the DEVICE TRACE: jax.profiler
records per-op start/duration on the device's own timeline, and the
serving step's window (first op start to last op end) is true device
time.  Dispatch walls and the streamed rate are still reported in the
detail block.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

from nimrud_tpu.utils.workload import (
    BENCH_RADII as RADII, BENCH_N_POINTS as N_POINTS,
    make_bench_cloud, make_bench_model, project_v5p, roofline_payload,
    roofline_rates)

BASELINE_PTS_PER_SEC = 5000.0 / len(RADII)
WARMUP_RUNS = 1
TIMED_RUNS = 2
TRACE_RUNS = 2

T0 = time.perf_counter()


def note(msg):
    print(f"[headline +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax

    # persistent XLA compile cache: remote relay compiles are
    # 90-500 s and dominate the stage budget; warm hits are ~0.1 s
    from nimrud_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

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
            note(f"fit done ({candidate})")
            for _ in range(WARMUP_RUNS):
                jax.block_until_ready(model.predict_device(cloud))
            backend_used = candidate
            note("warmup done (serving program compiled)")
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
    note("tracing serving step")
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
        note(f"traced: {trace_stats['window_ms_per_step']} ms/step")
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
    try:
        roofline = roofline_payload(model, staged)
    except Exception as error:      # pragma: no cover
        roofline = {"error": str(error)[:120]}

    if trace_stats and "window_ms_per_step" in trace_stats:
        step_ms = trace_stats["window_ms_per_step"]
        rate = N_POINTS / (step_ms / 1e3)
        metric = ("serving step device time (profiler trace), 1M-point "
                  "cloud, 3 scales, single chip")
        semantics = "device-trace window per serving step"
        if roofline and "bytes_total" in roofline:
            roofline = roofline_rates(roofline, step_ms,
                                      str(jax.devices()[0]))
        # the v5p north-star projection (BASELINE.json targets v5p;
        # the bench chip is v5e): per-hotspot scaling model, published
        # spec ratios, optimistic + conservative bounds
        projected = project_v5p(step_ms)
    else:
        rate = N_POINTS / min(times)
        metric = ("end-to-end dispatch-side step wall, 1M-point cloud, "
                  "3 scales, single chip (trace unavailable)")
        semantics = "dispatch-side on relay-attached TPU"
        projected = {"error": "no traced window to project from"}

    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "points/sec",
        "vs_baseline": round(rate / BASELINE_PTS_PER_SEC, 1),
        "trace": trace_stats,
        "roofline": roofline,
        "projected_v5p": projected,
        "stages_sec": stages,
        "n_points": N_POINTS,
        "scales": list(RADII),
        "train_accuracy":
            None if accuracy is None else round(accuracy, 4),
        "device": str(jax.devices()[0]),
        "backend": backend_used,
        "timing_semantics": semantics,
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard exit: relay-attached TPU processes can hang in teardown
    # after heavy use; the JSON is already printed
    os._exit(0)


if __name__ == "__main__":
    main()
