"""
Explicit neighbor retrieval (radius lists + kNN) against scipy cKDTree.
"""

import numpy as np
from scipy.spatial import cKDTree

from nimrud_tpu.ops import neighbors


RNG = np.random.default_rng(10)


def test_radius_neighbors_match_kdtree():
    query = (RNG.random((300, 3)) * 6).astype(np.float32)
    search = (RNG.random((2000, 3)) * 6).astype(np.float32)
    radius = 0.7

    got = neighbors.radius_neighbors(query, search, radius, k_max=64)
    tree = cKDTree(search.astype(np.float64))
    oracle = tree.query_ball_point(query.astype(np.float64), radius)

    for i, idx in enumerate(oracle):
        ours = set(got["indices"][i][got["valid"][i]].tolist())
        assert got["count"][i] == len(idx) or \
            abs(got["count"][i] - len(idx)) <= 1   # fp boundary
        if got["count"][i] == len(idx):
            assert ours == set(idx), f"query {i}"
    assert not got["overflowed"].any()


def test_radius_neighbors_truncation_flagged():
    # dense blob: more neighbors than k_max -> overflow flagged, nearest kept
    search = RNG.normal(0, 0.1, (500, 3)).astype(np.float32)
    query = np.zeros((1, 3), np.float32)
    got = neighbors.radius_neighbors(query, search, 1.0, k_max=16)
    assert got["overflowed"][0]
    assert got["count"][0] > 16
    # the 16 kept are the nearest ones
    dist = np.linalg.norm(search, axis=1)
    nearest = np.sort(dist)[:16]
    assert np.allclose(np.sort(got["distances"][0]), nearest, atol=1e-4)


def test_knn_matches_kdtree():
    query = (RNG.random((200, 3)) * 5).astype(np.float32)
    search = (RNG.random((3000, 3)) * 5).astype(np.float32)
    k = 8
    got = neighbors.knn(query, search, k, max_radius=2.0)
    tree = cKDTree(search.astype(np.float64))
    dist, idx = tree.query(query.astype(np.float64), k=k)
    within = dist <= 2.0
    assert within.all(), "test construction: horizon too small"
    assert np.allclose(got["distances"], dist, atol=1e-4)
    # indices match except distance ties
    mismatch = got["indices"] != idx
    if mismatch.any():
        assert np.allclose(got["distances"][mismatch], dist[mismatch],
                           atol=1e-4)


def test_knn_horizon_masks():
    # fewer than k points within the horizon -> invalid slots
    search = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    query = np.zeros((1, 3), np.float32)
    got = neighbors.knn(query, search, k=4, max_radius=1.0)
    assert got["valid"][0].sum() == 1
    assert got["indices"][0][0] == 0
