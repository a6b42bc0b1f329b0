"""
Golden parity: the TPU minimal pipeline against a float64 scipy/NumPy
oracle of the reference's behavioral contract
(reference: nimrud/minimal/multiscale.py, nimrud/minimal/features.py).
"""

import numpy as np
import pytest

from nimrud_tpu.features import minimal
from nimrud_tpu.utils.geometry import VoxelFilter

from helpers import drop_ambiguous_points, minimal_multiscale_oracle


RNG = np.random.default_rng(10)


def _make_clouds(n_query=600, n_search=3000, extent=8.0,
                 edges=(0.4, 0.8), radii=(0.6, 1.2)):
    """Clouds with no points near a voxel-face or ball-surface boundary."""
    search = RNG.random((n_search, 3)) * extent
    query = RNG.random((n_query, 3)) * extent

    # voxel faces: grid origins depend on the search cloud itself, which
    # changes as we drop points -- iterate to a fixed point
    for _ in range(4):
        grids = []
        for edge in edges:
            vf = VoxelFilter(search, edge)
            grids.append((vf.minimum_corner, edge))
        before = len(search)
        search = drop_ambiguous_points(search, grids=grids)
        if len(search) == before:
            break

    # ball surfaces: voxel centers near radius boundaries of any query
    for edge, radius in zip(edges, radii):
        vf = VoxelFilter(search, edge)
        voxels = vf.unique_voxels(search)
        from scipy.spatial import cKDTree
        tree = cKDTree(voxels)
        hi = tree.query_ball_point(query, radius * (1 + 1e-4))
        lo = tree.query_ball_point(query, radius * (1 - 1e-4))
        bad_query = [i for i, (l, h) in enumerate(zip(lo, hi))
                     if len(l) != len(h)]
        query = np.delete(query, bad_query, axis=0)
    return query, search


def test_single_scale_parity():
    query, search = _make_clouds(edges=(0.4,), radii=(0.6,))
    ours = minimal.one_scale_single_core(query, search, 0.4, 0.6)
    oracle = minimal_multiscale_oracle(query, search, (0.4,), (0.6,))

    assert ours.shape == oracle.shape
    # population: exact
    assert np.array_equal(ours[:, 0], oracle[:, 0])
    # centroid displacement
    assert np.allclose(ours[:, 1], oracle[:, 1], atol=5e-5)
    # normalized eigenvalues
    assert np.allclose(ours[:, 2:], oracle[:, 2:], atol=5e-4)


def test_multiscale_parity():
    edges, radii = (0.4, 0.8), (0.6, 1.2)
    query, search = _make_clouds(edges=edges, radii=radii)
    ours = minimal.process_single_core(query, search, edges, radii)
    oracle = minimal_multiscale_oracle(query, search, edges, radii)

    assert ours.shape == (len(query), 8)
    for s in range(2):
        base = 4 * s
        assert np.array_equal(ours[:, base], oracle[:, base]), \
            f"population mismatch at scale {s}"
        assert np.allclose(
            ours[:, base + 1], oracle[:, base + 1], atol=5e-5)
        assert np.allclose(
            ours[:, base + 2:base + 4], oracle[:, base + 2:base + 4],
            atol=5e-4)


def test_empty_and_singleton_neighborhoods():
    # isolated query points far from the search cloud: all features zero
    search = RNG.random((500, 3))
    query = np.array([[50.0, 50.0, 50.0], [0.5, 0.5, 0.5]])
    feats = minimal.one_scale_single_core(query, search, 0.2, 0.3)
    assert np.all(feats[0] == 0)
    assert feats[1, 0] > 0

    # a query with exactly one voxel in range: population 1, centroid
    # defined, eigenfeatures zero
    search = np.array([[0., 0., 0.], [10., 10., 10.]])
    query = np.array([[0.3, 0., 0.]])
    feats = minimal.one_scale_single_core(query, search, 0.5, 0.5)
    assert feats[0, 0] == 1
    assert feats[0, 1] > 0
    assert np.all(feats[0, 2:] == 0)


def test_query_order_restored():
    # the driver sorts queries internally; output must align with input
    query, search = _make_clouds(n_query=300, edges=(0.4,), radii=(0.6,))
    feats = minimal.one_scale_single_core(query, search, 0.4, 0.6)
    perm = RNG.permutation(len(query))
    feats_perm = minimal.one_scale_single_core(query[perm], search, 0.4, 0.6)
    assert np.allclose(feats[perm], feats_perm, atol=1e-6)


def test_mismatched_scales_rejected():
    with pytest.raises(AssertionError):
        minimal.process_single_core(
            RNG.random((10, 3)), RNG.random((10, 3)), (0.5,), (0.5, 1.0))
