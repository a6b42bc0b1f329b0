"""
Native (C++) host runtime: must be bit-identical to the NumPy fallback.
Skipped wholesale when no compiler is available.
"""

import numpy as np
import pytest

from nimrud_tpu import native
from nimrud_tpu.ops import grid

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native library unavailable")

RNG = np.random.default_rng(10)


def _clustered_cloud(n):
    ground = RNG.random((n // 2, 3)) * [40, 40, 0.2]
    blob = RNG.normal([25, 25, 4], [5, 5, 1.5], (n // 2, 3))
    return np.vstack([ground, blob]).astype(np.float32)[:n]


@pytest.mark.parametrize("m", [1, 2, 3])
def test_build_matches_numpy(m):
    cloud = _clustered_cloud(60_000)
    centers = cloud[::3].copy()
    kwargs = dict(query_tile_factor=m, query_capacity=32, entry_batch=64)

    with_native = grid.build_tiled_problem(cloud, centers, 0.7, **kwargs)
    saved_lib, saved_tried = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        without = grid.build_tiled_problem(cloud, centers, 0.7, **kwargs)
    finally:
        native._lib, native._tried = saved_lib, saved_tried

    for attr in ("query_index", "neighbor_rows", "candidates",
                 "entry_centers"):
        assert np.array_equal(
            getattr(with_native, attr), getattr(without, attr)), \
            f"{attr} differs between native and NumPy builds (m={m})"


def test_tile_sort_oracle():
    cloud = _clustered_cloud(20_000)
    lo = cloud.min(0).astype(np.float64) - 1e-3
    edge = 0.5
    dims = np.maximum(np.ceil(
        ((cloud.max(0).astype(np.float64) + 1e-3) - lo) / edge
    ).astype(np.int64), 1)
    ids, order, counts = native.tile_sort(cloud, lo, edge, dims, 2)

    qdims = -(-dims // 2)
    coords = np.clip(np.floor(
        (cloud.astype(np.float64) - lo) / edge).astype(np.int64),
        0, dims - 1) // 2
    oracle_ids = (coords[:, 0] + coords[:, 1] * qdims[0]
                  + coords[:, 2] * qdims[0] * qdims[1])
    assert np.array_equal(ids, oracle_ids)
    assert np.array_equal(order, np.argsort(oracle_ids, kind="stable"))
    assert np.array_equal(
        counts, np.bincount(oracle_ids, minlength=int(qdims.prod())))


def test_voxel_unique_oracle():
    cloud = _clustered_cloud(20_000)
    lo = cloud.min(0).astype(np.float64) - 0.25
    edge = 0.5
    dims = np.maximum(np.ceil(
        ((cloud.max(0).astype(np.float64) + 0.25) - lo) / edge
    ).astype(np.int64), 1)
    centers = native.voxel_unique(cloud, lo, edge, dims)

    coords = np.clip(np.floor(
        (cloud.astype(np.float64) - lo) / edge).astype(np.int64),
        0, dims - 1)
    keys = np.unique(coords[:, 0] + coords[:, 1] * dims[0]
                     + coords[:, 2] * dims[0] * dims[1])
    oracle = np.stack([
        (keys % dims[0] + 0.5) * edge + lo[0],
        ((keys // dims[0]) % dims[1] + 0.5) * edge + lo[1],
        (keys // (dims[0] * dims[1]) + 0.5) * edge + lo[2]], axis=1)
    assert centers.shape == oracle.shape
    assert np.allclose(centers, oracle, atol=1e-5)


def test_ascii_parser():
    import tempfile, os
    cloud = RNG.random((200, 4)).astype(np.float32) * 100
    for delim, suffix in ((",", "csv"), (" ", "xyz")):
        path = os.path.join(tempfile.mkdtemp(), f"c.{suffix}")
        np.savetxt(path, cloud, delimiter=delim, fmt="%.5f",
                   header="a comment", comments="# ")
        loaded = native.ascii_loader.load(path)
        assert loaded is not None
        assert loaded.shape == (200, 4)
        assert np.allclose(loaded, cloud, atol=1e-4)


def test_minmax3_matches_numpy():
    pts = _clustered_cloud(10_001)
    lo, hi = native.minmax3(pts)
    assert np.array_equal(lo, pts.min(0))
    assert np.array_equal(hi, pts.max(0))
    assert native.minmax3(np.zeros((0, 3), np.float32)) is None


def test_quantize_pad_to():
    pts = _clustered_cloud(1000)
    lo = pts.min(0).astype(np.float64)
    step = float((pts.max(0) - lo).max()) / 65000.0
    out = native.quantize_u16(pts, lo, step, pad_to=1024)
    assert out.shape == (1024, 3)
    assert (out[1000:] == out[999]).all()
    plain = native.quantize_u16(pts, lo, step)
    assert np.array_equal(out[:1000], plain)
