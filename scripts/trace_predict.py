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

import numpy as np  # noqa: F401

from nimrud_tpu.utils.profiling import device_op_table, device_track_stats
from nimrud_tpu.utils.workload import (
    BENCH_N_POINTS as N_POINTS, lower_predict, make_bench_cloud,
    make_bench_model)


def main():
    import jax

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    precision = sys.argv[3] if len(sys.argv) > 3 else "highest"
    tile_m = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cloud, labels = make_bench_cloud()
    model = make_bench_model(cloud, backend=backend,
                             precision=precision, epochs=3,
                             tile_m=tile_m)
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
        text = lower_predict(model, staged).compile().as_text()
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
