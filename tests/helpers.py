"""
Float64 oracle implementations used by parity tests.

These re-derive the reference's minimal-pipeline math (voxel dedup via the
host VoxelFilter, closed-ball radius queries via scipy cKDTree, covariance
eigenfeatures via LAPACK) in vectorized NumPy, independent of the device
code under test.
"""

import numpy as np
from scipy.spatial import cKDTree

from nimrud_tpu.utils.geometry import VoxelFilter


def minimal_one_scale_oracle(query, search, edge, radius):
    """[population, centroid, eig1, eig2] per query point, float64."""
    vf = VoxelFilter(search, edge)
    voxels = vf.unique_voxels(search)
    tree = cKDTree(voxels)
    neighborhoods = tree.query_ball_point(query, radius)

    out = np.zeros((len(query), 4))
    for i, idx in enumerate(neighborhoods):
        pts = voxels[idx]
        n = len(pts)
        out[i, 0] = n
        if n == 0:
            continue
        mean = pts.mean(0)
        out[i, 1] = np.linalg.norm(query[i] - mean)
        if n < 2:
            continue
        centered = pts - mean
        cov = centered.T @ centered / (n - 1)
        eigs = np.linalg.eigvalsh(cov)
        total = eigs.sum()
        if total > 0:
            eigs = eigs / total
            out[i, 2] = eigs[2]
            out[i, 3] = eigs[1]
    return out


def minimal_multiscale_oracle(query, search, edges, radii):
    return np.concatenate(
        [minimal_one_scale_oracle(query, search, e, r)
         for e, r in zip(edges, radii)], axis=1)


def drop_ambiguous_points(points, grids=(), balls=(), tol=1e-4):
    """
    Remove points that sit numerically close to a decision boundary, so
    float32 device math and float64 oracle math agree exactly on the
    discrete choices (voxel membership, ball membership).

    grids: sequence of (origin, edge) -- drop points within tol*edge of a
           voxel face.
    balls: sequence of (centers, radius) -- drop points within tol*radius
           of any ball surface.
    """
    keep = np.ones(len(points), dtype=bool)
    for origin, edge in grids:
        frac = (points - np.asarray(origin)) / edge
        keep &= np.all(np.abs(frac - np.round(frac)) > tol, axis=1)
    for centers, radius in balls:
        tree = cKDTree(points)
        shell = tree.query_ball_point(
            centers, radius * (1 + tol))
        inner = tree.query_ball_point(
            centers, radius * (1 - tol))
        for lo, hi in zip(inner, shell):
            for idx in set(hi) - set(lo):
                keep[idx] = False
    return points[keep]
