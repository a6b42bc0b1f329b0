"""
Explicit neighbor retrieval: fixed-K radius neighbor lists and k-nearest
neighbors.

The feature pipelines never materialize neighborhoods (moments are
matmuls), but users of the reference could ask for the neighbor indices
themselves (reference: nimrud/prototypes/ch.py cu_query_neighborhood
:1916-2022, the kdtree query_ball_tree at nimrud/minimal/multiscale.py:103).
This module provides that surface TPU-natively: distances against the
tiled candidate axis, then masked top-k.

Both functions return static-shape results: ``(indices, valid)`` padded
to K, plus an overflow count for radius queries so truncation is never
silent (the reference never truncated; SURVEY.md section 7 calls out this
contract).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.ops import grid


@functools.partial(
    jax.jit, static_argnames=("k", "radius", "mode", "entry_batch"))
def _neighbor_kernel(query, search, query_index, neighbor_rows,
                     candidates, entry_centers, k, radius, mode,
                     entry_batch):
    n_entries, q_cap = query_index.shape
    n_batches = n_entries // entry_batch
    n_query = query.shape[0]
    n_search = search.shape[0]

    query_pad = jnp.vstack([query, jnp.zeros((1, 3), query.dtype)])
    search_pad = jnp.vstack([search, jnp.zeros((1, 3), search.dtype)])

    def one_batch(batch):
        q_idx, rows, centers = batch
        q_pts = query_pad[jnp.where(q_idx < 0, n_query, q_idx)]
        q_local = q_pts - centers[:, None, :]
        c_idx = candidates[rows].reshape(entry_batch, -1)
        s_valid = c_idx >= 0
        safe = jnp.where(c_idx < 0, n_search, c_idx)
        s_local = search_pad[safe] - centers[:, None, :]

        d2 = (jnp.sum(q_local * q_local, axis=-1)[:, :, None]
              + jnp.sum(s_local * s_local, axis=-1)[:, None, :]
              - 2.0 * jnp.einsum(
                  "bqd,bsd->bqs", q_local, s_local,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)

        big = jnp.float32(np.inf)
        in_range = s_valid[:, None, :]
        if mode == "radius":
            in_range = in_range & (d2 <= radius * radius)
        in_range = jnp.broadcast_to(in_range, d2.shape)
        masked = jnp.where(in_range, d2, big)
        # top-k smallest distances
        neg, pos = jax.lax.top_k(-masked, k)
        dist2 = -neg
        found = jnp.isfinite(dist2)
        flat_pos = jnp.take_along_axis(
            jnp.broadcast_to(safe[:, None, :], masked.shape), pos, axis=2)
        idx = jnp.where(found, flat_pos, -1)
        count = jnp.sum(in_range, axis=2)
        return idx, jnp.sqrt(dist2), found, count

    batched = (
        query_index.reshape(n_batches, entry_batch, q_cap),
        neighbor_rows.reshape(n_batches, entry_batch, -1),
        entry_centers.reshape(n_batches, entry_batch, 3),
    )
    idx, dist, found, count = jax.lax.map(one_batch, batched)

    def scatter(value, width, fill, dtype):
        flat = value.reshape(-1, width).astype(dtype)
        targets = query_index.reshape(-1)
        targets = jnp.where(targets < 0, n_query, targets)
        out = jnp.full((n_query + 1, width), fill, dtype)
        return out.at[targets].set(flat, mode="drop")[:n_query]

    return (scatter(idx, k, -1, jnp.int32),
            scatter(dist, k, np.inf, jnp.float32),
            scatter(found, k, False, jnp.bool_),
            scatter(count[..., None], 1, 0, jnp.int32)[:, 0])


def _run(query, search, k, radius, mode, tile_edge, entry_batch=256):
    query = np.asarray(query, dtype=np.float32)[:, :3]
    search = np.asarray(search, dtype=np.float32)[:, :3]
    problem = grid.build_tiled_problem(
        query, search, tile_edge, entry_batch=entry_batch)
    return _neighbor_kernel(
        jnp.asarray(query), jnp.asarray(search),
        jnp.asarray(problem.query_index),
        jnp.asarray(problem.neighbor_rows),
        jnp.asarray(problem.candidates),
        jnp.asarray(problem.entry_centers),
        int(k), float(radius), mode, int(entry_batch))


def radius_neighbors(query, search, radius, k_max=64):
    """
    All search points within ``radius`` of each query point, up to
    ``k_max`` per query (nearest kept when truncating).

    Returns dict with indices (N, k_max) int32 padded -1, distances
    (N, k_max) (inf-padded), valid mask, count (true neighbor count --
    count > k_max flags truncation), overflowed (bool array).
    """
    idx, dist, valid, count = _run(
        query, search, k_max, radius, "radius", tile_edge=radius)
    count = np.asarray(count)
    return {
        "indices": np.asarray(idx),
        "distances": np.asarray(dist),
        "valid": np.asarray(valid),
        "count": count,
        "overflowed": count > k_max,
    }


def knn(query, search, k, max_radius):
    """
    The ``k`` nearest search points within ``max_radius`` of each query.
    (A search horizon is required by the tiled design; set it generously.)

    Returns dict with indices (N, k), distances (N, k), valid.
    """
    idx, dist, valid, _ = _run(
        query, search, k, max_radius, "knn", tile_edge=max_radius)
    return {
        "indices": np.asarray(idx),
        "distances": np.asarray(dist),
        "valid": np.asarray(valid),
    }
