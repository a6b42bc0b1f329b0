"""
Honest steady-state throughput probe for the streamed serving path.

On this relay, dispatch is asynchronous and jax.block_until_ready does
not await dispatched device work, so enqueue-side timers cannot prove
completion.  The TPU executes launches in order, so fetching the LAST
stream output's labels forces the entire pipeline (all uploads + all
compute) to drain first.  Run this twice with different STREAM_N; the
difference in total wall time divided by the difference in cloud count
is the true per-cloud steady-state cost -- the unknown d2h channel-init
constant cancels.

Usage: STREAM_N=2 python scripts/stream_drain.py
"""

import json
import os
import time

import numpy as np

N_POINTS = 1_000_000
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)


def make_cloud(n, rng):
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = []
    for _ in range(8):
        offset = rng.random(2) * 90
        walls.append(rng.random((n // 16, 3)) * [0.2, 12, 9]
                     + [offset[0], offset[1], 0])
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    return np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]


def main():
    import jax
    from nimrud_tpu.pipeline import GeometryClassifier

    k = int(os.environ.get("STREAM_N", "2"))
    rng = np.random.default_rng(0)
    cloud, _ = make_cloud(N_POINTS, rng), None
    scaleset = [(e, (r,)) for e, r in zip(EDGES, RADII)]
    labels = (cloud[:, 2] > 3).astype(np.int32)

    model = GeometryClassifier(
        scaleset, kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 10, "seed": 0},
        transfer_dtype="uint16",
        bounds=(cloud.min(0) - 1.0, cloud.max(0) + 1.0))
    model.fit(cloud, labels, sample=100_000)
    # warm the compiled program (dispatch only; completion unprovable)
    model.predict_device(cloud)

    # jitter each cloud so staging really re-runs (same bounds bucket)
    # Optional host sleep between enqueue and fetch: the fetch itself
    # flips the relay into its degraded mode, so work still queued when
    # the fetch starts drains 30x slower.  If the sleep exceeds the true
    # healthy drain time, the fetch cost becomes a constant (channel
    # init + transfer) -- bisecting the sleep brackets the real rate.
    wait = float(os.environ.get("SLEEP_BEFORE_FETCH", "0"))
    clouds = (cloud + np.float32([0.001 * i, 0, 0]) for i in range(k))
    start = time.perf_counter()
    outs = list(model.predict_stream(clouds))
    t_enqueue = time.perf_counter() - start
    if wait:
        time.sleep(wait)
    fetch_start = time.perf_counter()
    last = np.asarray(outs[-1])         # forces full drain (in-order)
    t_fetch = time.perf_counter() - fetch_start

    print(json.dumps({
        "k": k,
        "enqueue_sec": round(t_enqueue, 3),
        "sleep_sec": wait,
        "fetch_sec": round(t_fetch, 3),
        "labels_checksum": int(last.sum()),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
