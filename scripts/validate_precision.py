"""
Measure matmul-precision tradeoffs of the fused moment kernel on real TPU.

Compares Precision.HIGHEST (6-pass f32 emulation), HIGH (bf16x3) and
DEFAULT (bf16) on the benchmark scene: per-step time, count-column
exactness, and feature agreement vs a float64 host oracle.  Decides
whether HIGH can be the fused default (VERDICT item 4).

Transfer-disciplined: all compute and comparisons run device-side; ONE
batched fetch at the very end (after timing) because the first
device->host read permanently degrades this relay.
"""

import json
import time

import numpy as np


N_POINTS = 262_144            # power of two: no pad copy
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)
SAMPLE = 4096
RUNS = 5


def make_cloud(n, rng):
    ground = rng.random((n // 2, 3)) * [50, 50, 0.15]
    walls = []
    for _ in range(8):
        offset = rng.random(2) * 45
        walls.append(rng.random((n // 16, 3)) * [0.2, 8, 9]
                     + [offset[0], offset[1], 0])
    canopy = rng.normal([30, 30, 7], [8, 8, 2], (n // 4, 3))
    return np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]


def host_oracle(query, search, edge, radius):
    """float64 (count, centroid displacement, eig1, eig2) per query."""
    from scipy.spatial import cKDTree
    from nimrud_tpu.features.multiscale import voxel_downsample
    centers, _ = voxel_downsample(search, edge)
    tree = cKDTree(centers.astype(np.float64))
    out = np.zeros((len(query), 4))
    for i, idx in enumerate(tree.query_ball_point(
            query.astype(np.float64), radius)):
        pts = centers[idx].astype(np.float64)
        n = len(pts)
        out[i, 0] = n
        if n == 0:
            continue
        mean = pts.mean(0)
        out[i, 1] = np.linalg.norm(query[i].astype(np.float64) - mean)
        if n >= 2:
            c = pts - mean
            cov = c.T @ c / n
            tr = np.trace(cov)
            if tr > 0:
                eigs = np.linalg.eigvalsh(cov) / tr
                out[i, 2], out[i, 3] = eigs[2], eigs[1]
    return out


def main():
    import jax
    import jax.numpy as jnp
    from nimrud_tpu.features.multiscale import extract_scaleset_fused

    rng = np.random.default_rng(0)
    cloud = make_cloud(N_POINTS, rng)
    scaleset = [(edge, (radius,)) for edge, radius in zip(EDGES, RADII)]
    rows = np.sort(rng.permutation(N_POINTS)[:SAMPLE])
    rows_dev = jnp.asarray(rows)

    feats, times = {}, {}
    for prec in ("highest", "mixed", "high", "default"):
        tuning = {"precision": prec}
        out = extract_scaleset_fused(
            cloud, cloud, scaleset, "minimal", tuning=tuning)
        jax.block_until_ready(out)              # compile + first run
        start = time.perf_counter()
        for _ in range(RUNS):
            out = extract_scaleset_fused(
                cloud, cloud, scaleset, "minimal", tuning=tuning)
        jax.block_until_ready(out)
        times[prec] = (time.perf_counter() - start) / RUNS
        feats[prec] = out

    # device-side comparisons (population columns: 0, 4, 8)
    pop_cols = jnp.asarray([4 * i for i in range(len(RADII))])
    report = {}
    for prec in ("mixed", "high", "default"):
        diff = feats[prec] - feats["highest"]
        pops = jnp.abs(diff[:, pop_cols])
        report[prec] = {
            "count_mismatches": jnp.sum(pops > 0),
            "max_abs_diff": jnp.max(jnp.abs(diff)),
        }
    samples = {p: feats[p][rows_dev] for p in feats}
    jax.block_until_ready((report, samples))

    # ---- single batched fetch (degrades the process; nothing timed after)
    fetched = jax.device_get((report, samples))
    report, samples = fetched

    oracle_stats = {}
    for prec in ("highest", "mixed", "high"):
        agree_rows = np.ones(SAMPLE, bool)
        max_err = 0.0
        for bi, (edge, radius) in enumerate(zip(EDGES, RADII)):
            want = host_oracle(cloud[rows], cloud, edge, radius)
            got = samples[prec][:, 4 * bi: 4 * bi + 4]
            same_pop = got[:, 0] == want[:, 0]
            agree_rows &= same_pop
            err = np.abs(got[same_pop] - want[same_pop]).max()
            max_err = max(max_err, float(err))
        oracle_stats[prec] = {
            "rows_with_matching_population": float(agree_rows.mean()),
            "max_abs_err_vs_f64": max_err,
        }

    print(json.dumps({
        "times_sec": {k: round(v, 4) for k, v in times.items()},
        "vs_highest": {
            p: {"count_mismatches": int(report[p]["count_mismatches"]),
                "max_abs_diff": float(report[p]["max_abs_diff"])}
            for p in report},
        "oracle": oracle_stats,
        "n_points": N_POINTS,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
