"""
Scaleset pipeline tests: geometric / oriented / covariance / vector
layouts against brute-force float64 oracles
(reference semantics: nimrud/prototypes/mso.py NB/OGNB/CNB/V_MSO chains,
with the C_MSO layout bugs fixed per SURVEY.md section 2c).
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from nimrud_tpu.features import layouts
from nimrud_tpu.features.multiscale import extract_scaleset, voxel_downsample
from nimrud_tpu.utils.geometry import VoxelFilter

from helpers import drop_ambiguous_points


RNG = np.random.default_rng(10)
EDGE = 0.4
RADII = (1.2, 0.6)          # descending, as the reference processes them


def _clouds():
    search = RNG.random((2500, 3)) * 6
    query = RNG.random((400, 3)) * 6
    for _ in range(4):
        vf = VoxelFilter(search, EDGE)
        before = len(search)
        search = drop_ambiguous_points(
            search, grids=[(vf.minimum_corner, EDGE)])
        if len(search) == before:
            break
    vf = VoxelFilter(search, EDGE)
    voxels = vf.unique_voxels(search)
    tree = cKDTree(voxels)
    for radius in RADII:
        hi = tree.query_ball_point(query, radius * (1 + 1e-4))
        lo = tree.query_ball_point(query, radius * (1 - 1e-4))
        bad = [i for i, (l, h) in enumerate(zip(lo, hi)) if len(l) != len(h)]
        query = np.delete(query, bad, axis=0)
    return query, search, voxels


def _neighborhood_stats(query, voxels, radius):
    """Per-query float64 (count, mean, central-cov(3x3)) over the voxels."""
    tree = cKDTree(voxels)
    hoods = tree.query_ball_point(query, radius)
    stats = []
    for i, idx in enumerate(hoods):
        pts = voxels[idx]
        n = len(pts)
        if n == 0:
            stats.append((0, np.zeros(3), np.zeros((3, 3))))
            continue
        mean = pts.mean(0)
        centered = pts - mean
        stats.append((n, mean, centered.T @ centered / n))
    return stats


def test_geometric_layout():
    query, search, voxels = _clouds()
    ours = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="geometric")
    assert ours.shape == (len(query), 8)

    for ri, radius in enumerate(RADII):
        block = ours[:, 4 * ri:4 * ri + 4]
        vol = 1e6 * (4 / 3) * np.pi * radius ** 3
        for qi, (n, mean, cov) in enumerate(
                _neighborhood_stats(query, voxels, radius)):
            assert block[qi, 0] == pytest.approx(n / vol, rel=1e-5)
            if n == 0:
                assert np.all(block[qi] == 0)
                continue
            assert block[qi, 1] == pytest.approx(
                np.linalg.norm(query[qi] - mean), abs=5e-5)
            if n >= 2 and np.trace(cov) > 0:
                eigs = np.linalg.eigvalsh(cov)
                eigs = eigs / eigs.sum()
                assert block[qi, 2] == pytest.approx(eigs[2], abs=5e-4)
                assert block[qi, 3] == pytest.approx(eigs[1], abs=5e-4)
            else:
                assert np.all(block[qi, 2:] == 0)


def test_oriented_layout():
    query, search, voxels = _clouds()
    ours = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="oriented")
    assert ours.shape == (len(query), 16)

    for ri, radius in enumerate(RADII):
        block = ours[:, 8 * ri:8 * ri + 8]
        for qi, (n, mean, cov) in enumerate(
                _neighborhood_stats(query, voxels, radius)):
            if n < 2 or np.trace(cov) <= 0:
                assert np.all(block[qi, 2:] == 0)
                continue
            vals, vecs = np.linalg.eigh(cov)        # ascending
            norm_vals = vals / vals.sum()
            # two smallest normalized eigenvalues, ascending
            assert block[qi, 2] == pytest.approx(norm_vals[0], abs=5e-4)
            assert block[qi, 3] == pytest.approx(norm_vals[1], abs=5e-4)
            # eigenvector xy components match up to sign (skip nearly
            # degenerate pairs where the subspace is ill-conditioned)
            gaps = np.diff(vals) / (vals.sum() + 1e-30)
            if gaps[0] > 1e-3 and gaps[1] > 1e-3:
                for k, col in [(0, (4, 5)), (1, (6, 7))]:
                    got = block[qi, list(col)]
                    want = vecs[:2, k]
                    same = np.allclose(got, want, atol=5e-3)
                    flipped = np.allclose(got, -want, atol=5e-3)
                    assert same or flipped, \
                        f"eigvec {k} mismatch at query {qi}: {got} vs {want}"


def test_covariance_layout():
    query, search, voxels = _clouds()
    ours = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="covariance")
    assert ours.shape == (len(query), 16)

    for ri, radius in enumerate(RADII):
        block = ours[:, 8 * ri:8 * ri + 8]
        for qi, (n, mean, cov) in enumerate(
                _neighborhood_stats(query, voxels, radius)):
            if n == 0:
                assert np.all(block[qi] == 0)
                continue
            # centroid column must survive (the reference overwrote it)
            assert block[qi, 1] == pytest.approx(
                np.linalg.norm(query[qi] - mean), abs=5e-5)
            scatter = cov * n
            tri = [scatter[0, 0], scatter[0, 1], scatter[0, 2],
                   scatter[1, 1], scatter[1, 2], scatter[2, 2]]
            assert np.allclose(block[qi, 2:], tri, atol=2e-3)


def test_vector_layout():
    search = RNG.random((2000, 3)) * 5
    attrs = RNG.random((2000, 3))
    query = RNG.random((200, 3)) * 5

    centers, center_attrs = voxel_downsample(search, EDGE, attrs)
    # oracle interp: chebyshev ball of radius EDGE around each center
    for ci in range(0, len(centers), 37):
        mask = np.max(np.abs(search - centers[ci]), axis=1) <= EDGE
        if mask.sum():
            assert np.allclose(
                center_attrs[ci], attrs[mask].mean(0), atol=5e-5), \
                f"interp mismatch at center {ci}"

    ours = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="vector", attributes=attrs)
    assert ours.shape == (len(query), 6)
    tree = cKDTree(centers)
    for ri, radius in enumerate(RADII):
        hoods = tree.query_ball_point(query, radius)
        for qi in range(0, len(query), 23):
            idx = hoods[qi]
            want = center_attrs[idx].mean(0) if idx else np.zeros(3)
            assert np.allclose(
                ours[qi, 3 * ri:3 * ri + 3], want, atol=1e-4), \
                f"vector mean mismatch at query {qi} radius {radius}"


def test_exclude_radius():
    pts = RNG.random((300, 3)) * 3
    with_self = extract_scaleset(
        pts, pts, [(0.0, (0.5,))], kind="minimal")
    without_self = extract_scaleset(
        pts, pts, [(0.0, (0.5,))], kind="minimal", exclude_radius=1e-4)
    assert np.array_equal(with_self[:, 0] - 1, without_self[:, 0])


def test_zero_edge_skips_voxelization():
    search = RNG.random((500, 3)) * 3
    query = RNG.random((100, 3)) * 3
    feats = extract_scaleset(query, search, [(0.0, (0.5,))], kind="minimal")
    tree = cKDTree(search)
    counts = np.array([len(i) for i in tree.query_ball_point(query, 0.5)])
    # boundary flips possible in f32; allow tiny disagreement
    assert np.abs(feats[:, 0] - counts).max() <= 1


def test_tiled_method_matches_dense():
    query, search, _ = _clouds()
    dense = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="geometric", method="dense")
    tiled = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="geometric", method="tiled")
    assert dense.shape == tiled.shape
    for ri in range(len(RADII)):
        base = 4 * ri
        # population (via density) may flip by one neighbor at a radius
        # boundary between the two fp32 paths
        vol = 1e6 * (4 / 3) * np.pi * RADII[ri] ** 3
        pop_diff = np.abs(dense[:, base] - tiled[:, base]) * vol
        assert pop_diff.max() <= 1 + 1e-3
        agree = pop_diff < 0.5
        assert agree.mean() > 0.99
        assert np.allclose(dense[agree, base + 1], tiled[agree, base + 1],
                           atol=5e-5)
        assert np.allclose(dense[agree, base + 2:base + 4],
                           tiled[agree, base + 2:base + 4], atol=1e-3)


def test_fused_method_matches_tiled():
    query, search, _ = _clouds()
    tiled = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="geometric", method="tiled")
    fused = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="geometric", method="fused")
    assert fused.shape == tiled.shape
    for ri, radius in enumerate(RADII):
        vol = 1e6 * (4 / 3) * np.pi * radius ** 3
        pop_diff = np.abs(fused[:, 4 * ri] - tiled[:, 4 * ri]) * vol
        # device f32 voxelization may flip a boundary cell vs host f64
        assert pop_diff.max() <= 2 + 1e-3
        agree = pop_diff < 0.5
        assert agree.mean() > 0.98
        cols = slice(4 * ri, 4 * ri + 4)
        assert np.allclose(fused[agree, cols], tiled[agree, cols],
                           atol=2e-3)


@pytest.mark.parametrize("kind", ["oriented", "covariance", "geometric"])
def test_fused_all_geometry_kinds(kind):
    query, search, _ = _clouds()
    tiled = extract_scaleset(
        query, search, [(EDGE, RADII)], kind=kind, method="tiled")
    fused = extract_scaleset(
        query, search, [(EDGE, RADII)], kind=kind, method="fused")
    assert fused.shape == tiled.shape
    # density column pins the neighbor sets; values compared where the
    # populations agree (device f32 voxelization may flip boundary cells)
    width = tiled.shape[1] // len(RADII)
    for ri in range(len(RADII)):
        pop = np.abs(fused[:, width * ri] - tiled[:, width * ri])
        agree = pop < 1e-9
        assert agree.mean() > 0.97
        if kind == "oriented":
            # eigenvector columns are sign/rotation ambiguous when the
            # smallest eigenvalues nearly tie: compare the invariant
            # columns (density, centroid, two normalized eigenvalues)
            block = slice(width * ri, width * ri + 4)
        else:
            block = slice(width * ri, width * (ri + 1))
        a, b = fused[agree, block], tiled[agree, block]
        assert np.allclose(a, b, atol=5e-2), np.abs(a - b).max()


def test_fused_method_rejects_unsupported():
    q = RNG.random((100, 3)).astype(np.float32)
    with pytest.raises(ValueError):
        extract_scaleset(q, q, [(0.0, (0.5,))], kind="minimal",
                         method="fused")
    with pytest.raises(ValueError):  # vector requires attributes
        extract_scaleset(q, q, [(0.2, (0.5,))], kind="vector",
                         method="fused")
    # removed/typo'd backends must raise, not silently fall back to
    # the ~30x-slower XLA path ("ragged" was valid until round 4)
    with pytest.raises(ValueError, match="unknown backend"):
        extract_scaleset(q, q, [(0.2, (0.5,))], kind="minimal",
                         method="fused", tuning={"backend": "ragged"})


def test_fused_vector_matches_tiled():
    # V_MSO through the single-dispatch fused path: device voxel interp
    # (ops.interp) + attribute-mean moments must match the host-planned
    # tiled path
    query, search, _ = _clouds()
    attrs = RNG.random((len(search), 2)).astype(np.float32)
    tiled = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="vector", attributes=attrs,
        method="tiled")
    fused = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="vector", attributes=attrs,
        method="fused")
    assert fused.shape == tiled.shape
    close = np.isclose(fused, tiled, atol=2e-3)
    # f32 voxelization may flip boundary cells for a few queries, and a
    # flipped cell changes that query's interpolated attributes
    assert close.all(axis=1).mean() > 0.95, close.all(axis=1).mean()


def test_layout_widths():
    assert layouts.LAYOUT_WIDTHS == {
        "minimal": 4, "geometric": 4, "oriented": 8, "covariance": 8,
        "eigen": 10, "sazo": 5}


def test_sazo_layout():
    # signed max z offset (the reference's SAZO stub, mso.py:690): the
    # signed z-displacement of the neighbor farthest from the query in z
    query, search, voxels = _clouds()
    ours = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="sazo")
    assert ours.shape == (len(query), 10)

    tree = cKDTree(voxels)
    for ri, radius in enumerate(RADII):
        block = ours[:, 5 * ri:5 * ri + 5]
        geom = extract_scaleset(
            query, search, [(EDGE, (radius,))], kind="geometric")
        assert np.allclose(block[:, :4], geom, atol=1e-6)
        hoods = tree.query_ball_point(query, radius)
        for qi, idx in enumerate(hoods):
            if not idx:
                assert block[qi, 4] == 0
                continue
            dz = voxels[idx, 2] - query[qi, 2]
            lo, hi = dz.min(), dz.max()
            want = hi if hi >= -lo else lo
            # skip |max| ~ |min| ties, ambiguous under f32
            if abs(abs(hi) - abs(lo)) > 1e-5:
                assert block[qi, 4] == pytest.approx(want, abs=1e-4)


def test_sazo_tiled_and_fused_match_dense():
    query, search, _ = _clouds()
    dense = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="sazo", method="dense")
    tiled = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="sazo", method="tiled")
    assert np.allclose(dense, tiled, atol=5e-4), np.abs(dense - tiled).max()
    fused = extract_scaleset(
        query, search, [(EDGE, RADII)], kind="sazo", method="fused")
    for ri in range(len(RADII)):
        pop_d = dense[:, 5 * ri] ; pop_f = fused[:, 5 * ri]
        agree = np.abs(pop_d - pop_f) < 1e-9
        assert agree.mean() > 0.97
        cols = slice(5 * ri, 5 * ri + 5)
        assert np.allclose(fused[agree, cols], dense[agree, cols],
                           atol=5e-2)


def test_bad_kind_rejected():
    with pytest.raises(ValueError):
        extract_scaleset(
            RNG.random((10, 3)), RNG.random((10, 3)),
            [(0.5, (1.0,))], kind="bogus")
    with pytest.raises(ValueError):
        extract_scaleset(
            RNG.random((10, 3)), RNG.random((10, 3)),
            [(0.5, (1.0,))], kind="vector")
