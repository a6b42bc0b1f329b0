"""
Overflow accounting in the device-resident tile grid: fixed capacities
must report saturation, never truncate silently (SURVEY section 7).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from nimrud_tpu.ops import device_grid


RNG = np.random.default_rng(7)


def _padded(points, bucket):
    out = np.zeros((bucket, 3), np.float32)
    out[: len(points)] = points
    if len(points):
        out[len(points):] = points[-1]
    valid = np.zeros(bucket, bool)
    valid[: len(points)] = True
    return jnp.asarray(out), jnp.asarray(valid)


def test_no_overflow_reports_zero():
    pts = RNG.random((500, 3)).astype(np.float32) * 4
    query, q_valid = _padded(pts, 512)
    spec = device_grid.make_spec(
        pts.min(0), pts.max(0), 1.0, n_query=512, s_cap=64)
    feats, stats = device_grid.fused_extract(
        query, q_valid, query, q_valid, spec, (1.0,), "minimal",
        None, "highest", 500, with_stats=True)
    assert int(stats["dropped_search"]) == 0
    assert int(stats["dropped_query"]) == 0
    assert np.isfinite(np.asarray(feats)).all()


def test_search_cap_overflow_detected():
    # 300 points inside ONE fine tile, s_cap=64: 236 must be reported
    clump = (RNG.random((300, 3)) * 0.5).astype(np.float32)
    spread = (RNG.random((40, 3)) * 8 + 2).astype(np.float32)
    pts = np.vstack([clump, spread])
    query, q_valid = _padded(pts, 512)
    spec = device_grid.make_spec(
        pts.min(0), pts.max(0), 1.0, n_query=512, s_cap=64)
    _, stats = device_grid.fused_extract(
        query, q_valid, query, q_valid, spec, (1.0,), "minimal",
        None, "highest", len(pts), with_stats=True)
    assert int(stats["dropped_search"]) == 300 - 64
    assert int(stats["dropped_query"]) == 0


def test_entry_cap_overflow_detected():
    # shrink e_cap below what the query load needs: the unslotted valid
    # queries are counted
    pts = (RNG.random((400, 3)) * 0.5).astype(np.float32)  # one coarse tile
    query, q_valid = _padded(pts, 512)
    spec = device_grid.make_spec(
        pts.min(0), pts.max(0), 1.0, n_query=512, s_cap=512, q_cap=16,
        entry_batch=8)
    tight = dataclasses.replace(spec, e_cap=16)  # 16*16=256 slots < 400
    _, stats = device_grid.fused_extract(
        query, q_valid, query, q_valid, tight, (1.0,), "minimal",
        None, "highest", len(pts), with_stats=True)
    assert int(stats["dropped_query"]) == 400 - 16 * 16
    assert int(stats["dropped_search"]) == 0


def test_voxel_downsampled_spec_is_exact():
    # the documented guarantee: s_cap derived from voxel_edge can never
    # overflow for a voxel-downsampled search set
    pts = (RNG.random((2000, 3)) * 6).astype(np.float32)
    from nimrud_tpu.features.multiscale import voxel_downsample
    centers, _ = voxel_downsample(pts, 0.4)
    bucket = 1
    while bucket < len(centers):
        bucket *= 2
    search, s_valid = _padded(centers, bucket)
    query, q_valid = _padded(pts[:256], 256)
    spec = device_grid.make_spec(
        pts.min(0), pts.max(0), 1.0, n_query=256, voxel_edge=0.4)
    _, stats = device_grid.fused_extract(
        query, q_valid, search, s_valid, spec, (1.0,), "minimal",
        None, "highest", 256, with_stats=True)
    assert int(stats["dropped_search"]) == 0
    assert int(stats["dropped_query"]) == 0


@pytest.mark.slow
def test_entry_estimate_trims_and_stays_lossless():
    # a sparse scene occupies few coarse tiles: e_cap shrinks, and the
    # trimmed spec must still slot every query (no silent drops)
    pts = np.vstack([
        (RNG.random((800, 3)) * [2, 2, 0.2]),         # dense sheet
        (RNG.random((50, 3)) * 0.5 + [30, 30, 6]),    # far clump
    ]).astype(np.float32)
    query, q_valid = _padded(pts, 1024)
    spec = device_grid.make_spec(
        pts.min(0), pts.max(0), 1.0, n_query=1024, s_cap=1024,
        entry_batch=32)
    trimmed = device_grid.with_entry_estimate(spec, pts)
    assert trimmed.e_cap < spec.e_cap, (trimmed.e_cap, spec.e_cap)

    full, stats_full = device_grid.fused_extract(
        query, q_valid, query, q_valid, spec, (1.0,), "minimal",
        None, "highest", len(pts), with_stats=True)
    trim, stats_trim = device_grid.fused_extract(
        query, q_valid, query, q_valid, trimmed, (1.0,), "minimal",
        None, "highest", len(pts), with_stats=True)
    assert int(stats_trim["dropped_query"]) == 0
    assert np.array_equal(np.asarray(full), np.asarray(trim))


def test_span_plan_occupancy_regression_guard():
    # the span kernel's cost is driven by plan occupancy (entries and
    # live candidate spans); this pins the plan on a reference scene so
    # a change that silently balloons it fails loudly.  Numbers derive
    # from the construction, not the kernel: entries >= ceil(n/q_cap),
    # and the live-span fraction on a surface-heavy scene stays well
    # under the dense worst case (m+2)^2 per entry.
    import numpy as np
    from nimrud_tpu.ops import device_grid
    rng = np.random.default_rng(4)
    n = 40_000
    ground = rng.random((n // 2, 3)) * [40, 40, 0.1]
    canopy = rng.normal([20, 20, 4], [6, 6, 1], (n // 2, 3))
    cloud = np.vstack([ground, canopy]).astype(np.float32)
    lo, hi = cloud.min(0).astype(np.float64), cloud.max(0).astype(np.float64)

    spec = device_grid.make_spec(lo, hi, 1.0, n_query=n, voxel_edge=0.5,
                                 q_cap=256)
    spec = device_grid.with_entry_estimate(spec, cloud)
    live_entries = device_grid.estimate_entries(cloud, spec)

    assert live_entries >= -(-n // spec.q_cap)
    # e_cap trims to live entries + headroom, not the worst-case grid
    assert spec.e_cap <= 2 * live_entries + 2 * spec.entry_batch
    # query slots: at least a third full on this scene (dead-slot
    # compute scales inversely with this)
    fill = n / (live_entries * spec.q_cap)
    assert fill > 0.25, fill
