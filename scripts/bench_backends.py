"""
Time the fused extraction backends on real TPU: XLA (candidate-table
gather + batched einsums) vs Pallas span-DMA (gather_kernel), plus the
mixed-precision XLA variant.  The benchmark-scale workload, extraction
only (device-resident; no host reads until the end).
"""

import json
import time

import numpy as np


N_POINTS = 1_048_576          # power of two
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)
RUNS = 5


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
    from nimrud_tpu.features.multiscale import extract_scaleset_fused

    rng = np.random.default_rng(0)
    cloud = make_cloud(N_POINTS, rng)
    scaleset = [(e, (r,)) for e, r in zip(EDGES, RADII)]

    variants = {
        "xla_highest": {"precision": "highest"},
        "xla_mixed": {"precision": "mixed"},
        "pallas_spans": {"backend": "pallas"},
    }
    times, sums = {}, {}
    for name, tuning in variants.items():
        try:
            out = extract_scaleset_fused(
                cloud, cloud, scaleset, "minimal", tuning=tuning)
            jax.block_until_ready(out)
            start = time.perf_counter()
            for _ in range(RUNS):
                out = extract_scaleset_fused(
                    cloud, cloud, scaleset, "minimal", tuning=tuning)
            jax.block_until_ready(out)
            times[name] = round((time.perf_counter() - start) / RUNS, 4)
            sums[name] = out.sum()          # device scalar, fetched later
        except Exception as error:
            times[name] = f"ERROR: {str(error)[:200]}"

    checks = {}
    try:
        fetched = jax.device_get(sums)
        base = fetched.get("xla_highest")
        for name, value in fetched.items():
            checks[name] = {
                "feature_sum": float(value),
                "rel_vs_xla_highest":
                    None if base is None or float(base) == 0
                    else float(abs(value - base) / abs(base)),
            }
    except Exception as error:
        checks["fetch_error"] = str(error)[:200]

    print(json.dumps({
        "per_extract_sec": times,
        "checks": checks,
        "n_points": N_POINTS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
