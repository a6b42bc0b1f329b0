"""
Device-compute profile of DESIGNATED-SEARCH streamed serving.

`GeometryClassifier.stage_search` precomputes the search-side serving
state (per-band voxel dedup, v_cap trim, span count tables) ONCE for a
fixed search map; clouds then stream against the handle and the
per-cloud step skips that work.  This script traces the per-cloud step
of that configuration on the bench workload (the cloud doubles as the
designated search map, so features are comparable with the self-search
step trace from scripts/trace_predict.py).

Realizes the reference's designated-search serving workflows
(reference nimrud/prototypes/apc.py:2357-2529, vmso_APC's search asset)
as the amortized production mode.

Usage:  python scripts/trace_designated.py [repeats]

One trace per process on the relay-attached TPU (the trace drain forces
a d2h that flips the process into the degraded mode; see CLAUDE.md).
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
    cloud, labels = make_bench_cloud()
    model = make_bench_model(cloud, backend="packed", epochs=3)
    model.fit(cloud, labels, sample=20_000)

    handle = model.stage_search(cloud)
    staged = model.stage(cloud, staged_search=handle)
    assert staged is not None, "designated-search fused path missing"
    jax.block_until_ready(model.predict_staged(staged))  # compile

    trace_dir = tempfile.mkdtemp(prefix="nimrud_trace_ds_")
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
        "mode": "designated_search",
        "repeats": repeats,
        "n_points": N_POINTS,
        "window_ms_total": round(window_us / 1e3, 3),
        "window_ms_per_predict": round(window_us / 1e3 / repeats, 3),
        "busy_ms_per_predict": round(busy_us / 1e3 / repeats, 3),
        "points_per_sec_device": round(
            N_POINTS / (window_us / 1e6 / repeats), 1),
        "device": str(jax.devices()[0]),
    }))
    for ms, n, name in table[:20]:
        print(f"{ms:10.2f} ms  n={n:6d}  {name[:40]:40s} "
              f"{src_of.get(name, '')}")

    if src_of:
        import collections
        by_src = collections.Counter()
        for ms, n, name in table:
            by_src[src_of.get(name, "<unattributed>")] += ms
        print("---- by source line ----")
        for src, ms in by_src.most_common(24):
            print(f"{ms:10.2f} ms  {src}")


if __name__ == "__main__":
    main()
