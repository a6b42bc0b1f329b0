"""
Tiled neighbor search: the voxel-hash-grid moment path for large clouds.

The dense path in :mod:`nimrud_tpu.ops.moments` is O(|query| x |search|).
This module bins the search cloud into cubic tiles with edge >= the
largest analysis radius, and the query cloud into tiles ``m`` times
coarser; every query's full neighborhood then lives in the (m+2)^3 search
tiles covering its query tile expanded by one search tile.  Moments are
computed as batched masked matmuls over that flat candidate axis --
O((m+2)^3 x tile occupancy) per query, independent of total cloud size.

TPU-first shape discipline (everything static, everything a matmul):
  * queries are packed into fixed-capacity *entries* -- an over-full query
    tile becomes several entries sharing the same candidate tiles -- so one
    dense region cannot inflate the padded capacity of every other;
  * the (m+2)^3 candidate tiles are gathered into ONE flat axis, so the
    distance computation and the per-radius masked moment accumulation are
    single large batched matmuls instead of 27 slivers;
  * per-entry arithmetic is recentered on the query-tile center for fp32
    health;
  * feature layouts and the scatter back to caller order run on device
    (:func:`tiled_features`), so the hot path never round-trips moments
    through the host.

This replaces the reference's entire spatial machinery -- GPU octrees,
density-adaptive partition rulebook, neighborhood-tensor gather/compaction
(reference: nimrud/prototypes/ch.py:1799-2144, mso.py:801-1147,
ch.py:969-1570) -- with a static grid + masks, one compiled kernel.
"""

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp


def _pow2(n, minimum=8):
    out = minimum
    while out < n:
        out *= 2
    return out


@dataclass
class TiledProblem:
    """Host-built static-shape description of one tiled query/search pair."""
    query_index: np.ndarray     # (E, Q_CAP) int32 into query array, -1 pad
    neighbor_rows: np.ndarray   # (E, (m+2)^3) int32 row into candidates
    candidates: np.ndarray      # (K+1, S_CAP) int32 into search array, -1 pad
    entry_centers: np.ndarray   # (E, 3) float32 query-tile centers
    tile_edge: float            # search tile edge (>= max radius)
    n_query: int
    stats: dict = field(default_factory=dict)

    @property
    def n_entries(self):
        return self.query_index.shape[0]


def build_tiled_problem(query, search, tile_edge, *, query_tile_factor=2,
                        query_capacity=None, entry_batch=32):
    """
    Bin both clouds (host NumPy, fully vectorized -- no per-tile Python).

    Args:
      tile_edge: search tile edge; must be >= the largest radius later
                 passed to tiled_moments/tiled_features.
      query_tile_factor: query tiles are this many search tiles across
                 (m).  Larger m -> bigger, more MXU-friendly candidate
                 axes but more over-fetch per query.
      query_capacity: queries per entry; default picks a power of two
                 around 2x the mean occupied-query-tile population.
    """
    query = np.asarray(query, dtype=np.float32)
    search = np.asarray(search, dtype=np.float32)
    tile_edge = float(tile_edge)
    m = int(query_tile_factor)

    # all cell-assignment math in float64 (identical in the NumPy and
    # native paths; NumPy-2 promotion would silently keep f32 here)
    lo = np.minimum(query.min(0), search.min(0)).astype(np.float64) - 1e-3
    hi = np.maximum(query.max(0), search.max(0)).astype(np.float64) + 1e-3
    dims = np.maximum(np.ceil((hi - lo) / tile_edge).astype(np.int64), 1)
    qdims = -(-dims // m)

    def linear(coords, d):
        return coords[:, 0] + coords[:, 1] * d[0] + coords[:, 2] * d[0] * d[1]

    n_grid = int(dims.prod())
    n_qgrid = int(qdims.prod())
    dense_ok = n_grid <= (1 << 26)

    from nimrud_tpu import native
    native_s = native.tile_sort(search, lo, tile_edge, dims, 1) \
        if dense_ok else None
    if native_s is not None:
        s_ids, s_order, s_tile_counts = native_s
        s_sorted_ids = None
    else:
        s_coords = np.clip(
            np.floor((search.astype(np.float64) - lo)
                     / tile_edge).astype(np.int64),
            0, dims - 1)
        s_ids = linear(s_coords, dims)
        s_order = np.argsort(s_ids, kind="stable").astype(np.int64)
        s_sorted_ids = s_ids[s_order]
        s_tile_counts = np.bincount(s_ids, minlength=n_grid) \
            if dense_ok else None

    native_q = native.tile_sort(query, lo, tile_edge, dims, m) \
        if dense_ok else None
    if native_q is not None:
        q_ids, q_order, q_tile_counts = native_q
        tile_ids = np.nonzero(q_tile_counts)[0]
        tile_counts = q_tile_counts[tile_ids]
        all_starts = np.concatenate(
            [[0], np.cumsum(q_tile_counts)])[:-1]
        tile_starts = all_starts[tile_ids]
    else:
        q_coords = np.clip(
            np.floor((query.astype(np.float64) - lo)
                     / tile_edge).astype(np.int64),
            0, dims - 1) // m
        q_ids = linear(q_coords, qdims)
        q_order = np.argsort(q_ids, kind="stable").astype(np.int64)
        q_sorted_ids = q_ids[q_order]
        tile_ids, tile_starts = np.unique(q_sorted_ids, return_index=True)
        tile_counts = np.diff(np.append(tile_starts, len(query)))

    if query_capacity is None:
        query_capacity = int(
            np.clip(_pow2(2 * len(query) // max(len(tile_ids), 1),
                          minimum=16), 16, 512))
    q_cap = int(query_capacity)

    # split each query tile into entries of at most q_cap; sizes are
    # padded to the batch multiple up front so no array is copied later
    entries_per_tile = -(-tile_counts // q_cap)
    n_entries = int(entries_per_tile.sum())
    e_pad = ((n_entries + entry_batch - 1) // entry_batch) * entry_batch
    entry_tile = np.full(e_pad, len(tile_ids), dtype=np.int64)
    entry_tile[:n_entries] = np.repeat(
        np.arange(len(tile_ids)), entries_per_tile)
    entry_rank = np.zeros(e_pad, dtype=np.int64)
    entry_rank[:n_entries] = (
        np.arange(n_entries)
        - np.repeat(np.cumsum(entries_per_tile)
                    - entries_per_tile, entries_per_tile))
    tile_starts_ext = np.append(tile_starts, 0)
    tile_counts_ext = np.append(tile_counts, 0)
    entry_start = tile_starts_ext[entry_tile] + entry_rank * q_cap
    entry_count = np.maximum(np.minimum(
        tile_counts_ext[entry_tile] - entry_rank * q_cap, q_cap), 0)

    query_index = native.fill_table(
        np.asarray(q_order, np.int32), entry_start.astype(np.int64),
        entry_count.astype(np.int64),
        np.arange(e_pad, dtype=np.int64), q_cap)
    if query_index is not None:
        query_index = query_index[:-1]
    else:
        query_index = np.full((e_pad, q_cap), -1, dtype=np.int32)
        row = np.repeat(np.arange(e_pad), entry_count)
        col = (np.arange(int(entry_count.sum()))
               - np.repeat(np.cumsum(entry_count) - entry_count,
                           entry_count))
        query_index[row, col] = q_order[
            np.repeat(entry_start, entry_count) + col]

    # candidate search tiles per occupied query tile: offsets -1..m
    n_off = (m + 2) ** 3
    tile_q_coords = np.stack(
        [tile_ids % qdims[0],
         (tile_ids // qdims[0]) % qdims[1],
         tile_ids // (qdims[0] * qdims[1])], axis=1)

    def _numpy_nid():
        base = tile_q_coords * m                    # search-tile coords
        offsets = np.array(
            [(dx, dy, dz)
             for dx in range(-1, m + 1)
             for dy in range(-1, m + 1)
             for dz in range(-1, m + 1)], dtype=np.int64)
        ncoord = base[:, None, :] + offsets[None, :, :]
        ok = np.all((ncoord >= 0) & (ncoord < dims), axis=2)
        nid = np.where(
            ok,
            ncoord[..., 0] + ncoord[..., 1] * dims[0]
            + ncoord[..., 2] * dims[0] * dims[1],
            -1)                                     # (T, n_off)
        return nid, ok

    if dense_ok:
        # dense O(grid) maps: no binary searches, no sorting.  Only
        # tiles that are BOTH occupied and adjacent to a query tile get
        # candidate rows -- empty neighbors share the one all-pad row.
        per_tile_counts = s_tile_counts if s_tile_counts is not None \
            else np.bincount(s_ids, minlength=n_grid)
        tile_first = np.concatenate(
            [[0], np.cumsum(per_tile_counts)])[:-1]
        neighbor_mask = native.mark_neighbors(
            tile_ids, dims, qdims, m, n_grid)
        if neighbor_mask is None:
            nid, ok = _numpy_nid()
            neighbor_mask = np.zeros(n_grid, dtype=bool)
            neighbor_mask[nid[ok]] = True
        else:
            nid = None
        needed = np.nonzero(neighbor_mask & (per_tile_counts > 0))[0]
        empty_row = len(needed)
        grid_row = np.full(n_grid, empty_row, dtype=np.int32)
        grid_row[needed] = np.arange(len(needed), dtype=np.int32)
        counts = per_tile_counts[needed]
        starts = tile_first[needed]
        tile_rows = native.neighbor_rows(
            tile_ids, dims, qdims, m, grid_row, empty_row)
        if tile_rows is None:
            if nid is None:
                nid, ok = _numpy_nid()
            tile_rows = np.where(
                nid >= 0, grid_row[np.where(nid < 0, 0, nid)], empty_row
            ).astype(np.int32)
    else:
        nid, ok = _numpy_nid()
        needed = np.unique(nid[ok])
        empty_row = len(needed)
        # huge sparse grids: binary-search fallback
        starts = np.searchsorted(s_sorted_ids, needed, side="left")
        counts = (np.searchsorted(s_sorted_ids, needed, side="right")
                  - starts)
        if len(needed):
            rowpos = np.clip(
                np.searchsorted(needed, np.where(nid < 0, 0, nid)),
                0, len(needed) - 1)
            hit = (nid >= 0) & (needed[rowpos] == nid)
            tile_rows = np.where(hit, rowpos, empty_row).astype(np.int32)
        else:
            tile_rows = np.full((len(tile_ids), n_off), empty_row, np.int32)

    # candidate table: one row per needed tile (+ trailing all-pad row)
    s_cap = _pow2(int(counts.max()) if len(counts) else 1)
    candidates = native.fill_table(
        np.asarray(s_order, np.int32), starts.astype(np.int64),
        counts.astype(np.int64),
        np.arange(len(needed), dtype=np.int64), s_cap) \
        if len(needed) else None
    if candidates is None:
        candidates = np.full((len(needed) + 1, s_cap), -1, dtype=np.int32)
        if len(needed):
            row = np.repeat(np.arange(len(needed)), counts)
            col = (np.arange(int(counts.sum()))
                   - np.repeat(np.cumsum(counts) - counts, counts))
            candidates[row, col] = s_order[
                np.repeat(starts, counts) + col]

    # entry_tile's padding rows point at the sentinel row appended here,
    # so one fancy index produces the padded tables directly
    tile_rows_ext = np.vstack(
        [tile_rows, np.full((1, n_off), empty_row, np.int32)])
    neighbor_rows = tile_rows_ext[entry_tile]

    centers_by_tile = np.vstack(
        [(tile_q_coords + 0.5) * (m * tile_edge) + lo, np.zeros((1, 3))])
    centers = centers_by_tile[entry_tile]

    fill = entry_count.sum() / max(e_pad * q_cap, 1)
    return TiledProblem(
        query_index=query_index,
        neighbor_rows=neighbor_rows,
        candidates=candidates,
        entry_centers=centers.astype(np.float32),
        tile_edge=tile_edge,
        n_query=len(query),
        stats={"q_cap": q_cap, "s_cap": s_cap, "n_off": n_off,
               "entries": n_entries, "fill": float(fill)})


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------

def _split_precision(precision):
    """(distance, moment) matmul precisions.  A tuple selects them
    separately: the distance matmul decides radius-boundary membership
    (counts change if it drifts), while the moment matmul's mask operand
    is exactly representable in bf16, so bf16x3 keeps counts exact
    there -- 'mixed' buys most of HIGH's speed at zero count drift."""
    if isinstance(precision, tuple):
        return precision
    return precision, precision


def _entry_stats(q_local, s_local, s_valid, aug, radii, exclude_radius,
                 precision=jax.lax.Precision.HIGHEST,
                 metric="euclidean", with_sazo=False):
    """Masked moments for one batch of entries (shared by both kernels).

    MXU shape discipline (trace-measured on v5e): the naive forms run
    the distance einsum with K=3 and the moment matmul with N=10 --
    both waste >90% of the 128x128 systolic array.  So
      * d2 is computed ELEMENTWISE on the VPU as per-axis squared
        differences (also numerically better than the |q|^2+|s|^2-2qs
        expansion: no cancellation, so ``precision`` never affects
        radius membership), and
      * the moment matmul runs TRANSPOSED, aug^T(K~10, S) @ mask^T(S, Q):
        M=K~10 streams through the array while the contraction (S) and
        output (Q) dims tile fully.
    """
    _, mom_prec = _split_precision(precision)
    if metric == "euclidean":
        d2 = 0.0
        for axis in range(3):
            diff = (q_local[:, :, None, axis]
                    - s_local[:, None, :, axis])
            d2 = d2 + diff * diff
    elif metric == "chebyshev":
        d = jnp.abs(q_local[:, :, None, 0] - s_local[:, None, :, 0])
        for axis in (1, 2):
            d = jnp.maximum(
                d, jnp.abs(q_local[:, :, None, axis]
                           - s_local[:, None, :, axis]))
        d2 = d * d
    else:
        raise ValueError(f"unknown metric {metric!r}")

    base = s_valid[:, None, :]
    if exclude_radius is not None:
        base = base & (d2 >= exclude_radius * exclude_radius)
    if with_sazo:
        # signed max z offset (SAZO, reference stub mso.py:690): frame-
        # free z displacement, masked max/min over the candidate axis
        dz = s_local[:, None, :, 2] - q_local[:, :, None, 2]  # (B, Q, S)
        big = jnp.float32(1e30)

    per_radius = []
    for radius in radii:
        in_ball = base & (d2 <= radius * radius)
        mask = in_ball.astype(jnp.float32)
        # transposed orientation: (B, K~10, S) @ (B, S, Q) -> (B, K, Q)
        mom = jnp.einsum(
            "bsk,bqs->bqk", aug, mask,
            preferred_element_type=jnp.float32,
            precision=mom_prec)
        count = mom[..., 0]
        denom = jnp.maximum(count, 1.0)[..., None]
        mean_local = mom[..., 1:4] / denom
        mx, my, mz = (mean_local[..., 0], mean_local[..., 1],
                      mean_local[..., 2])
        outer = jnp.stack(
            [mx * mx, mx * my, mx * mz, my * my, my * mz, mz * mz],
            axis=-1)
        stats = {
            "count": count,
            "mean_local": mean_local,
            "cov": mom[..., 4:10] / denom - outer,
            "attr_mean": mom[..., 10:] / denom,
        }
        if with_sazo:
            top = jnp.max(jnp.where(in_ball, dz, -big), axis=-1)
            bot = jnp.min(jnp.where(in_ball, dz, big), axis=-1)
            stats["sazo"] = jnp.where(
                count > 0, jnp.where(top >= -bot, top, bot), 0.0)
        per_radius.append(stats)
    return per_radius


def _gather_batch(query_pad, search_pad, attr_pad, candidates, batch,
                  build_aug=True):
    q_idx, rows, centers = batch
    n_query_pad = query_pad.shape[0] - 1
    n_search_pad = search_pad.shape[0] - 1
    q_pts = query_pad[jnp.where(q_idx < 0, n_query_pad, q_idx)]
    q_local = q_pts - centers[:, None, :]

    c_idx = candidates[rows]                       # (B, n_off, S_CAP)
    c_idx = c_idx.reshape(c_idx.shape[0], -1)      # (B, flat)
    s_valid = c_idx >= 0
    safe = jnp.where(c_idx < 0, n_search_pad, c_idx)
    s_pts = search_pad[safe]
    s_local = s_pts - centers[:, None, :]

    if not build_aug:
        return q_pts, q_local, s_local, s_valid, None
    x, y, z = s_local[..., 0], s_local[..., 1], s_local[..., 2]
    aug = jnp.stack(
        [jnp.ones_like(x), x, y, z,
         x * x, x * y, x * z, y * y, y * z, z * z], axis=-1)
    if attr_pad is not None:
        aug = jnp.concatenate([aug, attr_pad[safe]], axis=-1)
    return q_pts, q_local, s_local, s_valid, aug


@functools.partial(
    jax.jit,
    static_argnames=("radii", "exclude_radius", "has_attr", "entry_batch",
                     "precision", "metric", "with_sazo"))
def _tiled_kernel(query, search, attributes, query_index, neighbor_rows,
                  candidates, entry_centers, radii, exclude_radius,
                  has_attr, entry_batch, precision, metric="euclidean",
                  with_sazo=False):
    """Raw moments in entry layout: dict of (E, Q_CAP, R, ...)."""
    n_entries, q_cap = query_index.shape
    n_batches = n_entries // entry_batch
    n_attr = attributes.shape[1] if has_attr else 0

    query_pad = jnp.vstack([query, jnp.zeros((1, 3), query.dtype)])
    search_pad = jnp.vstack([search, jnp.zeros((1, 3), search.dtype)])
    attr_pad = jnp.vstack(
        [attributes, jnp.zeros((1, n_attr), attributes.dtype)]) \
        if has_attr else None

    def one_batch(batch):
        _, q_local, s_local, s_valid, aug = _gather_batch(
            query_pad, search_pad, attr_pad, candidates, batch)
        centers = batch[2]
        per_radius = _entry_stats(
            q_local, s_local, s_valid, aug, radii, exclude_radius,
            precision, metric, with_sazo)
        out = {
            "count": jnp.stack([p["count"] for p in per_radius], axis=2),
            "mean": jnp.stack(
                [p["mean_local"] + centers[:, None, :] for p in per_radius],
                axis=2),
            "cov": jnp.stack([p["cov"] for p in per_radius], axis=2),
        }
        if has_attr:
            out["attr_mean"] = jnp.stack(
                [p["attr_mean"] for p in per_radius], axis=2)
        if with_sazo:
            out["sazo"] = jnp.stack(
                [p["sazo"] for p in per_radius], axis=2)
        return out

    batched = (
        query_index.reshape(n_batches, entry_batch, q_cap),
        neighbor_rows.reshape(n_batches, entry_batch, -1),
        entry_centers.reshape(n_batches, entry_batch, 3),
    )
    stats = jax.lax.map(one_batch, batched)
    return {key: value.reshape((n_entries, q_cap) + value.shape[3:])
            for key, value in stats.items()}


@functools.partial(
    jax.jit,
    static_argnames=("radii", "exclude_radius", "kind", "has_attr",
                     "entry_batch", "n_query", "precision", "backend",
                     "interpret", "metric"))
def _tiled_features_kernel(query, search, attributes, query_index,
                           neighbor_rows, candidates, entry_centers,
                           radii, exclude_radius, kind, has_attr,
                           entry_batch, n_query, precision,
                           backend="xla", interpret=False,
                           metric="euclidean"):
    """
    Fused: moments -> feature layout -> scatter to caller order, all on
    device.  Returns (n_query, total_width) float32.
    """
    # deferred import: features.layouts sits above ops in the layer map
    from nimrud_tpu.features import layouts

    n_entries, q_cap = query_index.shape
    n_batches = n_entries // entry_batch
    n_attr = attributes.shape[1] if has_attr else 0

    query_pad = jnp.vstack([query, jnp.zeros((1, 3), query.dtype)])
    search_pad = jnp.vstack([search, jnp.zeros((1, 3), search.dtype)])
    attr_pad = jnp.vstack(
        [attributes, jnp.zeros((1, n_attr), attributes.dtype)]) \
        if has_attr else None

    def one_batch(batch):
        needs_sazo = layouts.needs_sazo(kind)
        use_pallas = backend == "pallas" and not has_attr \
            and not needs_sazo and metric == "euclidean"
        q_pts, q_local, s_local, s_valid, aug = _gather_batch(
            query_pad, search_pad, attr_pad, candidates, batch,
            build_aug=not use_pallas)
        centers = batch[2]
        if use_pallas:
            from nimrud_tpu.ops.pallas import multiscale_kernel as pk
            slabs = pk.entry_moments.__wrapped__(
                q_local, s_local, s_valid, radii, interpret,
                exclude_radius)
            per_radius = pk.moments_from_slabs(slabs, centers, radii)
        else:
            per_radius = _entry_stats(
                q_local, s_local, s_valid, aug, radii, exclude_radius,
                precision, metric, with_sazo=needs_sazo)
        blocks = []
        for p, radius in zip(per_radius, radii):
            if kind == "vector":
                blocks.append(p["attr_mean"])
            else:
                blocks.append(layouts.build_block(
                    kind, p["count"], p["mean_local"] + centers[:, None, :],
                    p["cov"], q_pts, radius, sazo=p.get("sazo")))
        return jnp.concatenate(blocks, axis=-1)

    batched = (
        query_index.reshape(n_batches, entry_batch, q_cap),
        neighbor_rows.reshape(n_batches, entry_batch, -1),
        entry_centers.reshape(n_batches, entry_batch, 3),
    )
    feats = jax.lax.map(one_batch, batched)          # (NB, B, Q, W)
    width = feats.shape[-1]
    feats = feats.reshape(-1, width)
    flat_idx = query_index.reshape(-1)
    target = jnp.where(flat_idx < 0, n_query, flat_idx)
    out = jnp.zeros((n_query + 1, width), jnp.float32)
    out = out.at[target].set(feats, mode="drop")
    return out[:n_query]


# ---------------------------------------------------------------------------
# public drivers
# ---------------------------------------------------------------------------

def _check_radii(problem, radii):
    radii = tuple(float(r) for r in radii)
    if max(radii) > problem.tile_edge + 1e-9:
        raise ValueError(
            f"radius {max(radii)} exceeds tile edge {problem.tile_edge}")
    return radii


PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    # distance matmul HIGHEST (exact radius membership), moment matmul
    # HIGH (bf16x3; exact counts because the mask is 0/1): most of
    # HIGH's MXU speedup with no neighbor-set drift.  Measured on
    # TPU v5e: see scripts/validate_precision.py output in ROADMAP.
    "mixed": (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH),
}


def tiled_moments(problem, query, search, radii, *, attributes=None,
                  exclude_radius=None, entry_batch=32,
                  precision="highest", metric="euclidean",
                  with_sazo=False):
    """
    Neighborhood moments via the tile grid, aligned to the original query
    order.  Returns the same dict as
    :func:`nimrud_tpu.ops.moments.multiscale_moments` (NumPy arrays).
    """
    radii = _check_radii(problem, radii)
    has_attr = attributes is not None
    attr = jnp.asarray(attributes, dtype=jnp.float32) if has_attr \
        else jnp.zeros((search.shape[0], 0), dtype=jnp.float32)

    stats = _tiled_kernel(
        jnp.asarray(query, dtype=jnp.float32),
        jnp.asarray(search, dtype=jnp.float32),
        attr,
        jnp.asarray(problem.query_index),
        jnp.asarray(problem.neighbor_rows),
        jnp.asarray(problem.candidates),
        jnp.asarray(problem.entry_centers),
        radii,
        None if exclude_radius is None else float(exclude_radius),
        has_attr,
        int(entry_batch),
        PRECISIONS[precision],
        metric,
        bool(with_sazo))

    q_idx = problem.query_index
    valid = q_idx >= 0
    rows = q_idx[valid]
    out = {}
    for key, value in stats.items():
        value = np.asarray(value)
        shaped = np.zeros((problem.n_query,) + value.shape[2:],
                          dtype=value.dtype)
        shaped[rows] = value[valid]
        out[key] = shaped
    return out


def tiled_features(problem, query, search, radii, kind, *, attributes=None,
                   exclude_radius=None, entry_batch=32,
                   precision="highest", backend="xla",
                   metric="euclidean"):
    """
    Fused feature extraction through the tile grid: moments, layout, and
    the scatter back to the caller's query order all run on device.
    Returns a device array (n_query, width).
    """
    radii = _check_radii(problem, radii)
    has_attr = attributes is not None
    attr = jnp.asarray(attributes, dtype=jnp.float32) if has_attr \
        else jnp.zeros((search.shape[0], 0), dtype=jnp.float32)

    return _tiled_features_kernel(
        jnp.asarray(query, dtype=jnp.float32),
        jnp.asarray(search, dtype=jnp.float32),
        attr,
        jnp.asarray(problem.query_index),
        jnp.asarray(problem.neighbor_rows),
        jnp.asarray(problem.candidates),
        jnp.asarray(problem.entry_centers),
        radii,
        None if exclude_radius is None else float(exclude_radius),
        kind,
        has_attr,
        int(entry_batch),
        int(problem.n_query),
        PRECISIONS[precision],
        backend,
        jax.default_backend() not in ("tpu", "axon"),
        metric)
