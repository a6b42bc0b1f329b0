"""
Unit tests for the TPU compute primitives, checked against float64 NumPy
oracles and the host VoxelFilter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nimrud_tpu.ops import eigen, moments, packing, unique
from nimrud_tpu.utils.geometry import VoxelFilter


RNG = np.random.default_rng(10)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def test_gridspec_matches_voxelfilter():
    points = RNG.random((2000, 3)) * 50
    edge = 0.5
    spec = packing.GridSpec.fit(points, edge)
    vf = VoxelFilter(points, edge)
    assert np.allclose(spec.origin, vf.minimum_corner)
    assert list(spec.widths) == vf.widths.tolist()
    assert list(spec.shifts) == [0] + vf.shifts.tolist()

    # same cell assignment (keep points off cell boundaries)
    frac = (points - np.asarray(spec.origin)) / edge
    safe = np.all(np.abs(frac - np.round(frac)) > 1e-4, axis=1)
    pts = points[safe].astype(np.float32)
    keys = np.asarray(spec.encode(jnp.asarray(pts)))
    oracle = vf.coordinate_to_address(pts.astype(np.float64))
    assert np.array_equal(keys, oracle)

    # decode matches the oracle voxel centers
    centers = np.asarray(spec.decode(jnp.asarray(keys)))
    oracle_centers = vf.address_to_coordinate(oracle)
    assert np.allclose(centers, oracle_centers, atol=1e-4)


def test_gridspec_rejects_oversize():
    points = np.asarray([[0, 0, 0], [1e5, 1e5, 1e5]])
    with pytest.raises(ValueError):
        packing.GridSpec.fit(points, 0.01)


def test_gridspec_flat_axis():
    # an axis with zero span still gets one bit and round-trips
    points = RNG.random((100, 3)) * 10
    points[:, 2] = 5.0
    spec = packing.GridSpec.fit(points, 1.0)
    assert spec.widths[2] >= 1
    keys = spec.encode(jnp.asarray(points, dtype=jnp.float32))
    centers = np.asarray(spec.decode(keys))
    assert np.all(np.abs(centers - points) <= 1.0)


# ---------------------------------------------------------------------------
# unique
# ---------------------------------------------------------------------------

def test_unique_keys():
    values = RNG.integers(0, 500, size=2048).astype(np.int32)
    uniq, count = unique.unique_keys(jnp.asarray(values))
    uniq, count = np.asarray(uniq), int(count)
    expected = np.unique(values)
    assert count == expected.size
    assert np.array_equal(uniq[:count], expected)
    assert np.all(uniq[count:] == packing.PAD_KEY)


def test_unique_keys_with_valid_mask():
    values = RNG.integers(0, 100, size=512).astype(np.int32)
    valid = RNG.random(512) < 0.5
    uniq, count = unique.unique_keys(jnp.asarray(values), jnp.asarray(valid))
    expected = np.unique(values[valid])
    assert int(count) == expected.size
    assert np.array_equal(np.asarray(uniq)[:int(count)], expected)


def test_unique_voxels_matches_host():
    points = RNG.random((4000, 3)) * 20
    edge = 1.0
    spec = packing.GridSpec.fit(points, edge)
    # keep points off cell boundaries so f32/f64 agree on cell assignment
    frac = (points - np.asarray(spec.origin)) / edge
    points = points[np.all(np.abs(frac - np.round(frac)) > 1e-4, axis=1)]

    centers, count, mask = unique.unique_voxels(
        jnp.asarray(points, dtype=jnp.float32), spec)
    count = int(count)
    vf = VoxelFilter(points, edge)
    oracle = vf.unique_voxels(points)
    assert count == oracle.shape[0]
    assert np.allclose(np.asarray(centers)[:count], oracle, atol=1e-4)
    assert np.asarray(mask).sum() == count


# ---------------------------------------------------------------------------
# eigen
# ---------------------------------------------------------------------------

def _random_sym6(n, scale=1.0):
    a = RNG.normal(size=(n, 3, 3)) * scale
    sym = a @ np.transpose(a, (0, 2, 1))
    return eigen.pack_sym3(jnp.asarray(sym, dtype=jnp.float64))


def test_eigvalsh3_random():
    m6 = _random_sym6(500)
    ours = np.asarray(eigen.eigvalsh3(m6))
    oracle = np.linalg.eigvalsh(np.asarray(eigen.unpack_sym3(m6)))[:, ::-1]
    assert np.allclose(ours, oracle, rtol=1e-8, atol=1e-10)


def test_eigvalsh3_f32():
    m6 = _random_sym6(500).astype(jnp.float32)
    ours = np.asarray(eigen.eigvalsh3(m6))
    oracle = np.linalg.eigvalsh(
        np.asarray(eigen.unpack_sym3(m6), dtype=np.float64))[:, ::-1]
    spread = oracle[:, 0:1] - oracle[:, 2:3] + 1e-12
    assert np.all(np.abs(ours - oracle) / (np.abs(oracle).max(1, keepdims=True) + 1e-6) < 1e-4), \
        "f32 eigenvalues drifted beyond tolerance"
    assert np.all(np.diff(ours, axis=1) <= spread * 1e-5), "not descending"


def test_eigvalsh3_special_cases():
    cases = np.asarray([
        [0, 0, 0, 0, 0, 0],        # zero matrix
        [2, 0, 0, 2, 0, 2],        # scalar matrix
        [3, 0, 0, 2, 0, 1],        # diagonal
        [1, 0, 0, 1, 0, 5],        # repeated pair
    ], dtype=np.float64)
    ours = np.asarray(eigen.eigvalsh3(jnp.asarray(cases)))
    expected = np.asarray([
        [0, 0, 0],
        [2, 2, 2],
        [3, 2, 1],
        [5, 1, 1],
    ], dtype=np.float64)
    assert np.allclose(ours, expected, atol=1e-9)


def test_eigh3_vectors():
    m6 = _random_sym6(300)
    vals, vecs = eigen.eigh3(m6)
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    dense = np.asarray(eigen.unpack_sym3(m6))
    # A v = lambda v for each eigenpair
    for i in range(3):
        left = np.einsum("nij,nj->ni", dense, vecs[:, i, :])
        right = vals[:, i:i + 1] * vecs[:, i, :]
        assert np.allclose(left, right, atol=1e-6 * np.abs(vals).max())
    # orthonormal basis
    gram = np.einsum("nij,nkj->nik", vecs, vecs)
    assert np.allclose(gram, np.eye(3), atol=1e-8)


def test_eigh3_matches_lapack_subspaces():
    m6 = _random_sym6(200)
    _, vecs = eigen.eigh3(m6)
    vecs = np.asarray(vecs)
    dense = np.asarray(eigen.unpack_sym3(m6))
    _, lapack = np.linalg.eigh(dense)          # ascending columns
    # smallest eigvec matches up to sign
    dot_small = np.abs(np.einsum("ni,ni->n", vecs[:, 2, :], lapack[:, :, 0]))
    dot_big = np.abs(np.einsum("ni,ni->n", vecs[:, 0, :], lapack[:, :, 2]))
    assert np.all(dot_small > 1 - 1e-8)
    assert np.all(dot_big > 1 - 1e-8)


# ---------------------------------------------------------------------------
# moments
# ---------------------------------------------------------------------------

def _oracle_moments(query, search, valid, radii, exclude_radius=None,
                    attributes=None):
    """Brute-force float64 oracle."""
    search = search[valid]
    if attributes is not None:
        attributes = attributes[valid]
    out_count = np.zeros((len(query), len(radii)))
    out_mean = np.zeros((len(query), len(radii), 3))
    out_cov = np.zeros((len(query), len(radii), 6))
    out_attr = None if attributes is None else \
        np.zeros((len(query), len(radii), attributes.shape[1]))
    for qi, q in enumerate(query):
        d = np.linalg.norm(search - q, axis=1)
        for ri, r in enumerate(radii):
            mask = d <= r
            if exclude_radius is not None:
                mask &= d >= exclude_radius
            pts = search[mask]
            out_count[qi, ri] = len(pts)
            if len(pts) == 0:
                continue
            mean = pts.mean(0)
            out_mean[qi, ri] = mean
            centered = pts - mean
            cov = centered.T @ centered / len(pts)
            out_cov[qi, ri] = [cov[0, 0], cov[0, 1], cov[0, 2],
                               cov[1, 1], cov[1, 2], cov[2, 2]]
            if attributes is not None:
                out_attr[qi, ri] = attributes[mask].mean(0)
    return out_count, out_mean, out_cov, out_attr


def test_multiscale_moments_matches_oracle():
    n_query, n_search = 256, 700
    query = (RNG.random((n_query, 3)) * 4).astype(np.float32)
    search = (RNG.random((n_search, 3)) * 4).astype(np.float32)
    radii = (1.0, 0.5, 0.25)

    # pad search and keep some rows invalid
    padded = np.zeros((1024, 3), dtype=np.float32)
    padded[:n_search] = search
    valid = np.zeros(1024, dtype=bool)
    valid[:n_search] = True

    got = moments.multiscale_moments(
        jnp.asarray(query), jnp.asarray(padded), jnp.asarray(valid), radii,
        chunk_size=64)
    count, mean, cov, _ = _oracle_moments(
        query.astype(np.float64), padded.astype(np.float64), valid, radii)

    assert np.array_equal(np.asarray(got["count"]), count)
    have = count > 0
    assert np.allclose(np.asarray(got["mean"])[have], mean[have], atol=2e-5)
    assert np.allclose(np.asarray(got["cov"])[have], cov[have], atol=2e-5)


def test_multiscale_moments_empty_neighborhoods():
    query = np.zeros((64, 3), dtype=np.float32)
    query[:] = [100, 100, 100]                    # far from all search points
    search = RNG.random((128, 3)).astype(np.float32)
    got = moments.multiscale_moments(
        jnp.asarray(query), jnp.asarray(search),
        jnp.ones(128, dtype=bool), (0.5,), chunk_size=64)
    assert np.all(np.asarray(got["count"]) == 0)
    assert np.all(np.isfinite(np.asarray(got["mean"])))
    assert np.all(np.isfinite(np.asarray(got["cov"])))


def test_multiscale_moments_exclude_self():
    pts = (RNG.random((128, 3)) * 2).astype(np.float32)
    got = moments.multiscale_moments(
        jnp.asarray(pts), jnp.asarray(pts), jnp.ones(128, dtype=bool),
        (1.0,), chunk_size=64, exclude_radius=1e-3)
    count_incl = moments.multiscale_moments(
        jnp.asarray(pts), jnp.asarray(pts), jnp.ones(128, dtype=bool),
        (1.0,), chunk_size=64)["count"]
    # excluding self removes exactly one neighbor per query (points distinct)
    assert np.array_equal(
        np.asarray(got["count"]), np.asarray(count_incl) - 1)


def test_multiscale_moments_attributes():
    n_query, n_search = 64, 256
    query = (RNG.random((n_query, 3)) * 3).astype(np.float32)
    search = (RNG.random((n_search, 3)) * 3).astype(np.float32)
    attrs = RNG.random((n_search, 4)).astype(np.float32)
    radii = (1.0, 0.5)
    got = moments.multiscale_moments(
        jnp.asarray(query), jnp.asarray(search),
        jnp.ones(n_search, dtype=bool), radii,
        attributes=jnp.asarray(attrs), chunk_size=64)
    count, _, _, attr_mean = _oracle_moments(
        query.astype(np.float64), search.astype(np.float64),
        np.ones(n_search, bool), radii, attributes=attrs.astype(np.float64))
    assert np.array_equal(np.asarray(got["count"]), count)
    have = count > 0
    assert np.allclose(
        np.asarray(got["attr_mean"])[have], attr_mean[have], atol=2e-5)


def test_multiscale_moments_rejects_ragged():
    with pytest.raises(ValueError):
        moments.multiscale_moments(
            jnp.zeros((100, 3)), jnp.zeros((64, 3)),
            jnp.ones(64, dtype=bool), (1.0,), chunk_size=64)
