"""
Time the fused extraction backends on real TPU, DEVICE COMPUTE ONLY:
clouds and voxel centers are uploaded once, then each backend's jitted
program is timed on device-resident arrays.  Compares the XLA
candidate-table path (highest + mixed precision) against the Pallas
span-DMA kernel at the benchmark workload.
"""

import json
import time

import numpy as np


N_POINTS = 1_048_576          # power of two
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)
RUNS = 10


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
    import jax.numpy as jnp
    from nimrud_tpu.ops import device_grid, packing, unique

    rng = np.random.default_rng(0)
    cloud = make_cloud(N_POINTS, rng)
    lo = cloud.min(0).astype(np.float64)
    hi = cloud.max(0).astype(np.float64)

    query = jnp.asarray(cloud)
    q_valid = jnp.ones(N_POINTS, bool)
    bands = []
    for edge, radius in zip(EDGES, RADII):
        vox_spec = packing.GridSpec.fit_bounds(lo, hi, edge)
        centers, _, mask = unique.unique_voxels(query, vox_spec)
        spec = device_grid.make_spec(
            lo, hi, radius, n_query=N_POINTS, voxel_edge=edge)
        spec = device_grid.with_entry_estimate(spec, cloud)
        bands.append((centers, mask, spec, (radius,)))
    jax.block_until_ready([b[0] for b in bands])

    def run_xla(precision):
        outs = [device_grid.fused_extract(
            query, q_valid, centers, mask, spec, radii, "minimal",
            None, precision, N_POINTS)
            for centers, mask, spec, radii in bands]
        return outs

    def run_spans(span_batch):
        outs = [device_grid.fused_extract_spans(
            query, q_valid, centers, mask, spec, radii, "minimal",
            None, N_POINTS, span_batch=span_batch)
            for centers, mask, spec, radii in bands]
        return outs

    variants = {
        "xla_highest": lambda: run_xla("highest"),
        "xla_mixed": lambda: run_xla("mixed"),
        "pallas_spans_b1": lambda: run_spans(1),
        "pallas_spans_b8": lambda: run_spans(8),
        "pallas_spans_b16": lambda: run_spans(16),
    }
    times, sums = {}, {}
    for name, fn in variants.items():
        try:
            jax.block_until_ready(fn())          # compile + warm
            start = time.perf_counter()
            for _ in range(RUNS):
                outs = fn()
            jax.block_until_ready(outs)
            times[name] = round((time.perf_counter() - start) / RUNS, 5)
            sums[name] = sum(o.sum() for o in outs)
        except Exception as error:
            times[name] = f"ERROR: {str(error)[:300]}"

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

    rates = {name: round(N_POINTS * len(RADII) / t / 1e6, 1)
             for name, t in times.items() if isinstance(t, float)}
    print(json.dumps({
        "device_compute_sec_per_extract": times,
        "point_scales_per_sec_M": rates,
        "checks": checks,
        "n_points": N_POINTS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
