"""
kNN features and the full eigenvalue feature set, against float64 oracles.
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from nimrud_tpu.features.knn import knn_features
from nimrud_tpu.features.multiscale import extract_scaleset


RNG = np.random.default_rng(10)


def test_knn_features_match_oracle():
    query = (RNG.random((200, 3)) * 5).astype(np.float32)
    search = (RNG.random((4000, 3)) * 5).astype(np.float32)
    k = 12

    feats = knn_features(query, search, k, max_radius=2.0)
    assert feats.shape == (200, 4)

    tree = cKDTree(search.astype(np.float64))
    dist, idx = tree.query(query.astype(np.float64), k=k)
    for qi in range(0, 200, 13):
        pts = search[idx[qi]].astype(np.float64)
        assert feats[qi, 0] == k
        mean = pts.mean(0)
        assert feats[qi, 1] == np.float32(
            np.linalg.norm(query[qi] - mean)) or \
            abs(feats[qi, 1] - np.linalg.norm(query[qi] - mean)) < 1e-4
        centered = pts - mean
        eigs = np.linalg.eigvalsh(centered.T @ centered / k)
        eigs = eigs / eigs.sum()
        assert abs(feats[qi, 2] - eigs[2]) < 1e-3
        assert abs(feats[qi, 3] - eigs[1]) < 1e-3


def test_knn_features_horizon():
    search = np.array([[0, 0, 0], [0.1, 0, 0], [9, 9, 9]], np.float32)
    query = np.zeros((1, 3), np.float32)
    feats = knn_features(query, search, k=3, max_radius=1.0)
    assert feats[0, 0] == 2       # third point beyond the horizon


@pytest.mark.slow
def test_knn_eigen_kind():
    query = (RNG.random((50, 3)) * 3).astype(np.float32)
    search = (RNG.random((2000, 3)) * 3).astype(np.float32)
    feats = knn_features(query, search, 16, max_radius=2.0, kind="eigen")
    assert feats.shape == (50, 10)
    assert np.all(feats[:, 0] == 16)
    assert np.isfinite(feats).all()


def test_eigen_layout_oracle():
    query = (RNG.random((150, 3)) * 4).astype(np.float32)
    search = (RNG.random((3000, 3)) * 4).astype(np.float32)
    radius = 0.8

    feats = extract_scaleset(
        query, search, [(0.0, (radius,))], kind="eigen", method="dense")
    assert feats.shape == (150, 10)

    tree = cKDTree(search.astype(np.float64))
    hoods = tree.query_ball_point(query.astype(np.float64), radius)
    for qi in range(0, 150, 11):
        pts = search[hoods[qi]].astype(np.float64)
        n = len(pts)
        if n < 3:
            continue
        centered = pts - pts.mean(0)
        cov = centered.T @ centered / n
        l3, l2, l1 = np.linalg.eigvalsh(cov)
        trace = l1 + l2 + l3
        row = feats[qi]
        assert abs(row[2] - (l1 - l2) / l1) < 5e-3, "linearity"
        assert abs(row[3] - (l2 - l3) / l1) < 5e-3, "planarity"
        assert abs(row[4] - l3 / l1) < 5e-3, "scattering"
        assert abs(row[5] - np.cbrt(l1 * l2 * l3) / trace) < 5e-3, \
            "omnivariance"
        assert abs(row[6] - (l1 - l3) / l1) < 5e-3, "anisotropy"
        p = np.clip(np.array([l1, l2, l3]) / trace, 1e-12, 1)
        assert abs(row[7] - (-(p * np.log(p)).sum())) < 5e-3, "entropy"
        assert abs(row[8] - trace) / trace < 5e-3, "trace"
        assert abs(row[9] - l3 / trace) < 5e-3, "curvature"


def test_eigen_layout_through_fused():
    search = (RNG.random((20000, 3)) * 8).astype(np.float32)
    query = search[:2000]
    tiled = extract_scaleset(
        query, search, [(0.3, (0.6,))], kind="eigen", method="tiled")
    fused = extract_scaleset(
        query, search, [(0.3, (0.6,))], kind="eigen", method="fused")
    agree = tiled[:, 0] == fused[:, 0]
    assert agree.mean() > 0.97
    assert np.allclose(tiled[agree], fused[agree], atol=5e-2)
