"""
k-nearest-neighbor geometry features.

The radius pipelines define neighborhoods by a metric ball; this module
defines them by the k nearest search points (within a search horizon,
which the tiled design requires).  Output layout mirrors the minimal
contract with the count column reporting the effective neighbor count:

    [k_effective, centroid_displacement, eig1, eig2]          ("minimal")
    or the full eigenvalue set via kind="eigen" (width 10, with column 0
    = k_effective and no density -- density is a radius concept).

Implementation: tiled kNN retrieval (ops.neighbors) -> masked gather ->
moments -> closed-form eigensolve, all batched.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.features import layouts
from nimrud_tpu.ops import neighbors
from nimrud_tpu.ops.eigen import eigvalsh3


def knn_features(query, search, k, max_radius, kind="minimal"):
    """
    Geometry features over each query point's k nearest neighbors.

    Args:
      query / search: (N, >=3) arrays (XYZ used).
      k: neighbors per query.
      max_radius: search horizon (neighbors beyond it are not seen).
      kind: "minimal" ([k_eff, centroid, eig1, eig2]) or "eigen"
            (the full eigenvalue feature set, k_eff in column 0).

    Returns (N, width) float32.
    """
    query = np.asarray(query, dtype=np.float32)[:, :3]
    search = np.asarray(search, dtype=np.float32)[:, :3]
    got = neighbors.knn(query, search, k, max_radius)
    idx = jnp.asarray(got["indices"])
    valid = jnp.asarray(got["valid"])
    return np.asarray(_knn_feature_kernel(
        jnp.asarray(query), jnp.asarray(search), idx, valid, kind))


@jax.jit
def _knn_moments(query, search, idx, valid):
    search_pad = jnp.vstack([search, jnp.zeros((1, 3), search.dtype)])
    pts = search_pad[jnp.where(idx < 0, search.shape[0], idx)]
    # neighborhood math relative to the query point for fp32 health
    rel = (pts - query[:, None, :]) * valid[..., None]
    count = valid.sum(axis=1).astype(jnp.float32)
    denom = jnp.maximum(count, 1.0)
    mean_rel = rel.sum(axis=1) / denom[:, None]
    centered = (rel - mean_rel[:, None, :]) * valid[..., None]
    x, y, z = centered[..., 0], centered[..., 1], centered[..., 2]
    cov = jnp.stack([
        (x * x).sum(1), (x * y).sum(1), (x * z).sum(1),
        (y * y).sum(1), (y * z).sum(1), (z * z).sum(1)], axis=1) \
        / denom[:, None]
    return count, mean_rel, cov


def _knn_feature_kernel(query, search, idx, valid, kind):
    count, mean_rel, cov = _knn_moments(query, search, idx, valid)
    centroid = jnp.where(
        count > 0, jnp.linalg.norm(mean_rel, axis=1), 0.0)
    vals = eigvalsh3(cov)
    trace = cov[:, 0] + cov[:, 3] + cov[:, 5]
    ok = (count >= 2) & (trace > 0)
    safe = jnp.where(trace > 0, trace, 1.0)

    if kind == "minimal":
        norm = jnp.where(ok[:, None], vals / safe[:, None], 0.0)
        return jnp.stack(
            [count, centroid, norm[:, 0], norm[:, 1]], axis=1)
    if kind == "eigen":
        # reuse the eigen layout with count standing in for density
        block = layouts.eigen_block(
            count, mean_rel + query, cov, query, 1.0)
        return block.at[:, 0].set(count)
    raise ValueError(f"unsupported knn feature kind {kind!r}")
