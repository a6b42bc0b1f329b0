"""
Fully device-resident tiled extraction.

The host-built plan (:mod:`nimrud_tpu.ops.grid`) costs ~0.5 s per band per
million points on a weak host while the device kernel costs milliseconds.
This module moves the ENTIRE build into XLA with static bounds, so one
jitted call takes a raw cloud to features:

  encode fine/coarse tile ids          (elementwise)
  stable sort by id                    (lax.sort_key_val)
  per-tile counts/starts               (scatter-add + cumsum)
  candidate table over the full grid   (gather; empty tiles stay padded)
  entry table with overflow splitting  (searchsorted over entry offsets;
                                        static capacity G_q + N/Q_CAP)
  masked-moment kernel + layout + scatter (shared with ops.grid)

Static-shape discipline: grid dimensions are bucketed (rounded up), the
candidate table covers the WHOLE fine grid (so candidate rows are fine
tile ids -- no compaction index), and the entry count is bounded by
#coarse tiles + N/Q_CAP regardless of the point distribution.

The per-fine-tile capacity S_CAP must be an upper bound on tile occupancy.
For voxel-downsampled search sets it is exact by construction:
(ceil(tile_edge/voxel_edge) + 1)^3.  Raw search sets need a caller-provided
bound (overflowing points would be silently dropped).
"""

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.ops import grid as host_grid


@dataclass(frozen=True)
class DeviceGridSpec:
    """Static description of one fused extraction problem."""
    lo: tuple                 # fine-grid origin (float)
    dims: tuple               # fine-grid dimensions (int, bucketed)
    tile_edge: float
    m: int                    # query tiles are m fine tiles across
    q_cap: int                # queries per entry
    s_cap: int                # max search points per fine tile
    e_cap: int                # entry capacity (multiple of entry_batch)
    entry_batch: int
    # span-path entry packing: entries are blocks of q_cap consecutive
    # SORTED-RANK queries within a coarse-row SEGMENT of up to x_seg
    # x-adjacent coarse tiles (x_seg=1 degenerates to one-coarse-tile
    # entries, the XLA candidate-table scheme).  Packing along the
    # sorted-rank axis keeps q slots ~100% full regardless of per-tile
    # occupancy, and x-adjacent tiles' candidate x-rows UNION into one
    # contiguous span each -- fewer, denser DMAs.
    x_seg: int = 1

    @property
    def qdims(self):
        return tuple(-(-d // self.m) for d in self.dims)

    @property
    def seg_shape(self):
        """(segments per coarse row, total segments)."""
        qd = self.qdims
        x_seg = max(min(self.x_seg, qd[0]), 1)
        nseg_x = -(-qd[0] // x_seg)
        return nseg_x, nseg_x * qd[1] * qd[2]

    @property
    def span_rows(self):
        """Worst-case live points in one candidate x-row span: an entry
        whose queries stretch across a whole x_seg-tile segment covers
        (x_seg * m + 2) fine tiles per row."""
        x_seg = max(min(self.x_seg, self.qdims[0]), 1)
        return (x_seg * self.m + 2) * self.s_cap

    @property
    def n_grid(self):
        d = self.dims
        return d[0] * d[1] * d[2]

    @property
    def n_qgrid(self):
        d = self.qdims
        return d[0] * d[1] * d[2]


def make_spec(bounds_lo, bounds_hi, tile_edge, *, n_query, m=3, q_cap=128,
              s_cap=None, voxel_edge=None, entry_batch=256,
              dims_round=16, x_seg=1):
    """
    Build the static spec from dataset bounds (host side, scalars only).

    s_cap: per-fine-tile occupancy bound; derived exactly from
    ``voxel_edge`` when the search set is voxel-downsampled.

    q_cap: queries per entry.  The span kernel wants 256 (fewer, fatter
    entries -- per-span overhead dominates lane compute; trace-measured
    64 -> 128 -> 256 gave 678 -> 600 -> ~510 ms on the 1M-pt bench
    extract, v5e); the XLA masked-matmul path wants 128 (dead q slots
    multiply its (B, Q, S) mask compute directly).  Callers pick per
    backend; the default suits the XLA path.

    x_seg: span-path entry packing width in coarse tiles (see
    DeviceGridSpec.x_seg).  >1 only affects fused_extract_spans; the
    XLA candidate-table path ignores it.
    """
    lo = np.asarray(bounds_lo, np.float64) - 1e-3
    hi = np.asarray(bounds_hi, np.float64) + 1e-3
    dims = np.maximum(np.ceil((hi - lo) / tile_edge).astype(np.int64), 1)
    dims = ((dims + dims_round - 1) // dims_round) * dims_round

    if s_cap is None:
        if voxel_edge is None:
            raise ValueError("need s_cap or voxel_edge")
        per_axis = int(np.ceil(tile_edge / voxel_edge)) + 1
        s_cap = host_grid._pow2(per_axis ** 3)
    qdims = -(-dims // m)
    x_seg = max(min(int(x_seg), int(qdims[0])), 1)
    nseg_x = int(-(-qdims[0] // x_seg))
    n_seg = nseg_x * int(qdims[1]) * int(qdims[2])
    raw_entries = n_seg + n_query // q_cap + 1
    e_cap = ((raw_entries + entry_batch - 1) // entry_batch) * entry_batch
    return DeviceGridSpec(
        lo=tuple(float(v) for v in lo),
        dims=tuple(int(d) for d in dims),
        tile_edge=float(tile_edge),
        m=int(m), q_cap=int(q_cap), s_cap=int(host_grid._pow2(s_cap)),
        e_cap=int(e_cap), entry_batch=int(entry_batch), x_seg=x_seg)


def estimate_entries(query, spec):
    """
    Host-exact entry demand for a query cloud under ``spec``: the sum of
    ceil(population / q_cap) over occupied coarse-row SEGMENTS (x_seg
    x-adjacent coarse tiles; plain coarse tiles when x_seg=1).  Used to
    size ``e_cap`` from real occupancy instead of the worst-case
    n_segments + n/q_cap bound (dead entries still cost kernel batches).
    """
    from nimrud_tpu import native
    query = np.asarray(query, np.float32)
    lo = np.asarray(spec.lo, np.float64)
    dims = np.asarray(spec.dims, np.int64)
    got = native.tile_sort(query, lo, spec.tile_edge, dims, spec.m)
    if got is not None:
        _, _, counts = got
    else:
        cell = np.clip(
            np.floor((query.astype(np.float64) - lo) / spec.tile_edge
                     ).astype(np.int64), 0, dims - 1) // spec.m
        qd = np.asarray(spec.qdims, np.int64)
        ids = cell[:, 0] + cell[:, 1] * qd[0] + cell[:, 2] * qd[0] * qd[1]
        counts = np.bincount(ids, minlength=int(qd.prod()))
    qd = spec.qdims
    x_seg = max(min(spec.x_seg, qd[0]), 1)
    if x_seg > 1:
        nseg_x, _ = spec.seg_shape
        counts = np.asarray(counts).reshape(qd[2] * qd[1], qd[0])
        pad = nseg_x * x_seg - qd[0]
        if pad:
            counts = np.pad(counts, ((0, 0), (0, pad)))
        counts = counts.reshape(-1, nseg_x, x_seg).sum(axis=2)
    return int(np.sum(-(-counts // spec.q_cap)))


def with_entry_estimate(spec, query):
    """Spec with ``e_cap`` sized from measured occupancy plus headroom
    (device f32 binning can flip boundary points between tiles, so the
    host-exact estimate gets an eighth extra and two entry batches)."""
    import dataclasses
    need = estimate_entries(query, spec)
    need += max(need // 8, 2 * spec.entry_batch)
    e_cap = ((need + spec.entry_batch - 1)
             // spec.entry_batch) * spec.entry_batch
    if e_cap >= spec.e_cap:
        return spec
    return dataclasses.replace(spec, e_cap=e_cap)


def _encode(points, spec, coarse):
    """Linear tile ids (int32), clipped into the grid."""
    lo = jnp.asarray(spec.lo, dtype=points.dtype)
    cell = jnp.floor((points - lo) / spec.tile_edge).astype(jnp.int32)
    dims = jnp.asarray(spec.dims, dtype=jnp.int32)
    cell = jnp.clip(cell, 0, dims - 1)
    if coarse:
        cell = cell // spec.m
        d = spec.qdims
    else:
        d = spec.dims
    return cell[:, 0] + cell[:, 1] * d[0] + cell[:, 2] * d[0] * d[1]


def _sort_and_count(ids, valid, n_grid):
    """Stable sort by id; per-tile counts and exclusive starts."""
    n = ids.shape[0]
    ids = jnp.where(valid, ids, n_grid)          # invalid rows sort last
    order = jnp.arange(n, dtype=jnp.int32)
    sorted_ids, sorted_order = jax.lax.sort_key_val(ids, order)
    counts = jnp.zeros(n_grid + 1, jnp.int32).at[ids].add(1)[:n_grid]
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    return sorted_order, counts, starts



def _tile_of_entry(offsets, e_cap, n_qgrid):
    """entry -> coarse tile, i.e. max t with offsets[t] <= e, WITHOUT
    jnp.searchsorted (a serial log(n) while loop on TPU).  Scatter each
    tile index at its first-entry slot (scatter-max resolves empty
    tiles sharing a slot to the one non-empty owner, which is the
    largest) and forward-fill with a cummax."""
    first = jnp.zeros(e_cap, jnp.int32).at[offsets[:-1]].max(
        jnp.arange(offsets.shape[0] - 1, dtype=jnp.int32), mode="drop")
    return jnp.clip(
        jax.lax.associative_scan(jnp.maximum, first), 0, n_qgrid - 1)


def build_tables(query, q_valid, search, s_valid, spec, with_stats=False):
    """
    Device-side plan: returns (query_index, neighbor_rows, candidates,
    entry_centers) with the same semantics as the host TiledProblem --
    except candidate rows are indexed by fine tile id (row n_grid = the
    all-pad empty row).

    With ``with_stats``, a fifth element reports capacity saturation
    (SURVEY section 7's overflow accounting -- fixed capacities must
    never truncate silently):
      dropped_search: search points beyond ``s_cap`` in their fine tile
                      (excluded from every neighborhood);
      dropped_query:  valid queries left without an entry slot because
                      ``e_cap`` saturated (they get zero features).
    Both are 0 for voxel-downsampled search sets and correctly sized
    specs; nonzero values mean the spec needs a larger cap.
    """
    n_grid, n_qgrid = spec.n_grid, spec.n_qgrid
    n_search = search.shape[0]
    n_query = query.shape[0]

    # --- candidates over the full fine grid -------------------------------
    s_order, s_counts, s_starts = _sort_and_count(
        _encode(search, spec, coarse=False), s_valid, n_grid)
    col = jnp.arange(spec.s_cap, dtype=jnp.int32)
    gather_at = jnp.clip(s_starts[:, None] + col[None, :], 0, n_search - 1)
    in_tile = col[None, :] < jnp.minimum(s_counts, spec.s_cap)[:, None]
    candidates = jnp.where(in_tile, s_order[gather_at], -1)
    candidates = jnp.concatenate(
        [candidates, jnp.full((1, spec.s_cap), -1, jnp.int32)], axis=0)

    # --- entries over the coarse grid --------------------------------------
    q_order, q_counts, q_starts = _sort_and_count(
        _encode(query, spec, coarse=True), q_valid, n_qgrid)
    per_tile = -(-q_counts // spec.q_cap)        # entries per coarse tile
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(per_tile)])  # (G_q+1,)
    entry = jnp.arange(spec.e_cap, dtype=jnp.int32)
    tile = _tile_of_entry(offsets, spec.e_cap, n_qgrid)
    rank = entry - offsets[tile]
    live = entry < offsets[n_qgrid]
    count = jnp.clip(q_counts[tile] - rank * spec.q_cap, 0, spec.q_cap)
    count = jnp.where(live, count, 0)
    start = q_starts[tile] + rank * spec.q_cap

    qcol = jnp.arange(spec.q_cap, dtype=jnp.int32)
    q_gather = jnp.clip(start[:, None] + qcol[None, :], 0, n_query - 1)
    query_index = jnp.where(
        qcol[None, :] < count[:, None], q_order[q_gather], -1)

    # --- neighbor rows + centers per entry ---------------------------------
    qd = spec.qdims
    tx = tile % qd[0]
    ty = (tile // qd[0]) % qd[1]
    tz = tile // (qd[0] * qd[1])
    dims = spec.dims
    rows = []
    for dx in range(-1, spec.m + 1):
        for dy in range(-1, spec.m + 1):
            for dz in range(-1, spec.m + 1):
                x = tx * spec.m + dx
                y = ty * spec.m + dy
                z = tz * spec.m + dz
                ok = ((x >= 0) & (x < dims[0]) & (y >= 0) & (y < dims[1])
                      & (z >= 0) & (z < dims[2]))
                fine = x + y * dims[0] + z * dims[0] * dims[1]
                rows.append(jnp.where(ok, fine, n_grid))
    neighbor_rows = jnp.stack(rows, axis=1)

    lo = jnp.asarray(spec.lo, dtype=jnp.float32)
    centers = (jnp.stack([tx, ty, tz], axis=1).astype(jnp.float32) + 0.5) \
        * (spec.m * spec.tile_edge) + lo
    if not with_stats:
        return query_index, neighbor_rows, candidates, centers
    stats = {
        "dropped_search": jnp.sum(
            jnp.maximum(s_counts - spec.s_cap, 0)).astype(jnp.int32),
        "dropped_query": (jnp.sum(q_valid.astype(jnp.int32))
                          - jnp.sum(count)).astype(jnp.int32),
    }
    return query_index, neighbor_rows, candidates, centers, stats


@functools.partial(
    jax.jit,
    static_argnames=("spec", "radii", "kind", "exclude_radius",
                     "n_out", "interpret", "span_batch", "precision",
                     "with_stats", "debug"))
def fused_extract_spans(query, q_valid, search, s_valid, spec, radii,
                        kind, exclude_radius, n_out, interpret=False,
                        span_batch=8, precision="highest",
                        with_stats=False, debug=None):
    """
    Raw padded clouds -> feature block via the Pallas span-DMA kernel
    (nimrud_tpu.ops.pallas.gather_kernel): search points are sorted by
    fine tile id on device, and the kernel streams each entry's
    candidate x-row spans from HBM with ring-buffered DMA -- no
    candidate index table exists at all.

    Entries are ROW-PACKED (spec.x_seg > 1): blocks of q_cap
    consecutive sorted-rank queries within a coarse-row segment of up
    to x_seg x-adjacent coarse tiles.  All queries of an entry share
    one candidate span per (dy, dz) row -- the UNION of their tiles'
    x-row segments, which is contiguous because the tiles are
    x-adjacent.  Versus one-tile entries this fills the q slots ~100%
    (the moment dot wastes no lanes on padding) and replaces many short
    spans with few dense ones (per-span DMA latency was the measured
    bottleneck).  Candidates beyond a query's own (m+2)^3 box are
    excluded by the same distance masks that handle in-box misses.

    Numerically equivalent to :func:`fused_extract` when no fine tile
    overflows ``spec.s_cap`` (voxel-downsampled search sets by
    construction); where a tile overflows, this path keeps ALL points
    of the span rather than truncating per tile.
    """
    from nimrud_tpu.features import layouts
    from nimrud_tpu.ops.pallas import gather_kernel, multiscale_kernel

    prob = _span_problem(query, q_valid, search, s_valid, spec)
    slabs = gather_kernel.span_moments.__wrapped__(
        prob["q_local"], prob["centers"], prob["span_starts"],
        prob["span_lens"], prob["sorted_t"],
        radii, spec.span_rows, exclude_radius, interpret, span_batch,
        precision, debug=debug)
    per_radius = multiscale_kernel.moments_from_slabs(
        slabs, prob["centers"], radii)

    blocks = []
    for p, radius in zip(per_radius, radii):
        blocks.append(layouts.build_block(
            kind, p["count"], p["mean_local"] + prob["centers"][:, None, :],
            p["cov"], prob["q_pts"], radius))
    feats = jnp.concatenate(blocks, axis=-1)
    feats_out = _unsort_features(feats, prob, spec, query.shape[0], n_out)
    if not with_stats:
        return feats_out
    # entries past e_cap never ran: their queries got the sentinel zero
    # row above.  Cheap (one sum over e_cap), always-correct overflow
    # accounting for the span path (SURVEY section 7: fixed capacities
    # must never truncate silently).
    stats = {"dropped_query": (
        jnp.sum(q_valid.astype(jnp.int32)) - jnp.sum(prob["count"])
    ).astype(jnp.int32)}
    return feats_out, stats


_QT_FUSED_MAX = 2 * 1024 * 1024   # rows of the (n, 3) q-gather operand


def _gather_q_t(cols, q_gather):
    """Sorted query coordinates -> (E, 3, q_cap) kernel query blocks
    with the COORDINATE axis on sublanes.

    A materialized f32[n, 3] is (8, 128)-tiled with the lane dim padded
    3 -> 128 (42x); as a kernel input at the 10M-point workload the
    (E, q_cap, 3) layout costs ~8.6 GB of HBM for the queries alone
    (it OOMed bench10m), so the packed kernel takes (3, q_cap) blocks
    per entry instead (8/3 sublane pad only).  Below ``_QT_FUSED_MAX``
    source rows the (n, 3) operand is small enough to pay for one fused
    row-gather + transpose; above, three flat column gathers avoid
    materializing the padded operand entirely."""
    qsx, qsy, qsz = cols
    e_cap, q_cap = q_gather.shape
    if qsx.shape[0] <= _QT_FUSED_MAX:
        q_sorted = jnp.stack([qsx, qsy, qsz], axis=-1)
        flat = q_sorted[q_gather.reshape(-1)].T        # fused transpose
        return jnp.swapaxes(flat.reshape(3, e_cap, q_cap), 0, 1)
    return jnp.stack(
        [qsx[q_gather], qsy[q_gather], qsz[q_gather]], axis=1)


def _pack_plan(query, q_valid, spec):
    """Query-side entry packing on ``spec``'s coarse segment grid: ONE
    tile-id sort of the queries, rank-block entries within coarse-row
    segments, per-entry coarse-x ranges, and shared entry centers.

    The multi-band packed path runs this ONCE and reuses it for every
    band (the query sort, the (E, q_cap) gather, and the final unsort
    were each ~25% of the serving step when repeated per band)."""
    n_qgrid = spec.n_qgrid
    n_query = query.shape[0]
    qd = spec.qdims
    x_seg = max(min(spec.x_seg, qd[0]), 1)
    nseg_x, n_seg = spec.seg_shape

    # tile ids linearize x fastest, so one sort by tile id also groups
    # by segment id (monotone in tile id) AND leaves each segment's
    # queries x-sorted -- an entry's tiles are a contiguous x range.
    q_iota = jnp.arange(n_query, dtype=jnp.int32)
    q_ids = jnp.where(q_valid, _encode(query, spec, coarse=True), n_qgrid)
    sorted_qids, q_order, qsx, qsy, qsz = jax.lax.sort(
        (q_ids, q_iota, query[:, 0], query[:, 1], query[:, 2]),
        num_keys=1)
    # SCATTER-FREE entry table: segments are rank-contiguous runs of
    # the sorted array (sid is monotone in tile id), so segment starts
    # and per-rank entry indices come from head flags + scans, and the
    # (start, count, segment) table per ENTRY from one near-sorted
    # compaction sort of the entry-head rows.  The previous per-segment
    # count histogram was a 1M-update scatter-add -- measured ~8.4 ms
    # on v5e (update-count bound; bin width irrelevant) where this
    # whole block costs ~3.3 ms (scripts-probed: cumsum 0.21, cummax
    # 0.39, flip-cummin 0.44, 3-payload sort 1.6).  Entry order is
    # identical: ranks sort by tile id, sid is monotone in tile id,
    # and blocks pack in rank order, exactly like the old
    # offsets-cumsum enumeration over segment ids.
    big = jnp.int32(2 ** 31 - 1)
    valid_r = sorted_qids < n_qgrid
    sid_r = jnp.where(valid_r,
                      (sorted_qids // qd[0]) * nseg_x
                      + (sorted_qids % qd[0]) // x_seg,
                      n_seg)
    step = jnp.concatenate(
        [jnp.ones(1, bool), sid_r[1:] != sid_r[:-1]])
    head = valid_r & step
    endf = valid_r & jnp.concatenate(
        [sid_r[1:] != sid_r[:-1], jnp.ones(1, bool)])
    hrank = jax.lax.cummax(jnp.where(head, q_iota, -1))
    blocks = jnp.where(endf, (q_iota - hrank) // spec.q_cap + 1, 0)
    b_incl = jnp.cumsum(blocks)
    # entry id per rank: blocks completed by EARLIER segments (the
    # exclusive cumsum; within a segment no own end has accumulated
    # yet) plus the rank's block within its segment
    e_r = (b_incl - blocks) + (q_iota - hrank) // spec.q_cap
    ehead = valid_r & (head | ((q_iota - hrank) % spec.q_cap == 0))
    erank = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(endf, q_iota, big))))      # my segment's end
    _, start, sid_e, seg_end = jax.lax.sort(
        (jnp.where(ehead, e_r, big), q_iota, sid_r, erank), num_keys=1)
    if n_query < spec.e_cap:        # small clouds: fewer ranks than
        pad = spec.e_cap - n_query  # entry slots; pads are dead rows
        start = jnp.concatenate([start, jnp.zeros(pad, jnp.int32)])
        sid_e = jnp.concatenate([sid_e, jnp.zeros(pad, jnp.int32)])
        seg_end = jnp.concatenate([seg_end, jnp.full(pad, -1, jnp.int32)])
    else:
        start, sid_e, seg_end = (start[:spec.e_cap], sid_e[:spec.e_cap],
                                 seg_end[:spec.e_cap])
    n_live = b_incl[-1]
    entry = jnp.arange(spec.e_cap, dtype=jnp.int32)
    live = entry < n_live
    seg = jnp.clip(sid_e, 0, n_seg - 1)
    count = jnp.where(live,
                      jnp.clip(seg_end - start + 1, 0, spec.q_cap), 0)
    start = jnp.where(live, start, 0)

    qcol = jnp.arange(spec.q_cap, dtype=jnp.int32)
    q_gather = jnp.clip(start[:, None] + qcol[None, :], 0, n_query - 1)
    q_t = _gather_q_t((qsx, qsy, qsz), q_gather)      # (E, 3, q_cap)

    # the entry's actual coarse-x range [tx_lo, tx_hi]: tile ids of its
    # first and last sorted queries (x-sorted within the segment)
    first_tid = jnp.clip(
        sorted_qids[jnp.clip(start, 0, n_query - 1)], 0, n_qgrid - 1)
    last_tid = jnp.clip(
        sorted_qids[jnp.clip(start + count - 1, 0, n_query - 1)],
        0, n_qgrid - 1)
    tx_lo = first_tid % qd[0]
    tx_hi = last_tid % qd[0]
    rid = seg // nseg_x
    ty = rid % qd[1]
    tz = rid // qd[1]
    lo = jnp.asarray(spec.lo, dtype=jnp.float32)
    coarse = spec.m * spec.tile_edge

    # entry center: midpoint of the coarse-x range (fp32 health of the
    # local frame); any consistent per-entry point is valid, and ONE
    # center shared by every band keeps cross-band arithmetic aligned
    centers = jnp.stack([
        lo[0] + (tx_lo + tx_hi + 1).astype(jnp.float32) * (0.5 * coarse),
        lo[1] + (ty.astype(jnp.float32) + 0.5) * coarse,
        lo[2] + (tz.astype(jnp.float32) + 0.5) * coarse,
    ], axis=1)

    return {
        "q_t": q_t, "centers": centers, "count": count,
        "start": start, "entry": entry,
        "tx_lo": tx_lo, "tx_hi": tx_hi, "ty": ty, "tz": tz,
        "coarse_edge": float(spec.m) * float(spec.tile_edge),
        # unsort pieces
        "sorted_qids": sorted_qids, "q_order": q_order,
        "q_iota": q_iota,
    }


def _search_tables(search, s_valid, spec, attrs=None, presorted=False):
    """QUERY-INDEPENDENT search-side tables of one band: tile-sorted
    rows plus per-tile start/count lookup tables.  Factored out of
    :func:`_band_spans` so designated-search serving
    (pipeline.stage_search) can compute them ONCE per search map and
    skip the per-cloud dedup sorts and count scatters entirely.

    PRIMITIVE COSTS (trace-measured, scripts/probe_datamove.py, 1M
    rows, v5e): sort 1.7 ms, sort w/ 3 f32 payloads 2.6 ms, (N,3) row
    gather 5.3 ms, three (N,) flat gathers 32 ms, row scatter 86 ms,
    scatter-add counts 6.7 ms, searchsorted ~70 ms (serial log(n)
    while loop).  Hence: coordinates ride the sorts as payloads,
    reorders end in one row gather, counts stay scatter-adds.

    ``presorted``: the search rows already arrive sorted by this spec's
    fine tile id with invalid rows last (``unique.unique_voxels`` with
    ``tile_spec`` folds that ordering into its compaction sort for
    free), so the tile-id sort here is skipped entirely.  Only valid
    with ``attrs=None``.
    """
    n_grid = spec.n_grid
    s_ids = jnp.where(s_valid, _encode(search, spec, coarse=False),
                      n_grid)
    if presorted:
        if attrs is not None:
            raise ValueError("presorted search cannot carry attrs")
        sx, sy, sz = search[:, 0], search[:, 1], search[:, 2]
        sa = []
    else:
        a_cols = [] if attrs is None \
            else [attrs[:, i] for i in range(attrs.shape[1])]
        _, sx, sy, sz, *sa = jax.lax.sort(
            (s_ids, search[:, 0], search[:, 1], search[:, 2], *a_cols),
            num_keys=1)
    s_counts = jnp.zeros(n_grid + 1, jnp.int32).at[s_ids].add(1)[:n_grid]
    s_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(s_counts)[:-1]])
    starts_ext = jnp.concatenate([s_starts, jnp.zeros(1, jnp.int32)])
    counts_ext = jnp.concatenate([s_counts, jnp.zeros(1, jnp.int32)])
    return {
        "sorted_pts": jnp.stack([sx, sy, sz, *sa], axis=-1),
        # (start, count) pairs in one table: the span-bounds lookups
        # become TWO row gathers instead of THREE flat gathers (TPU
        # gathers are index-rate bound; flat 1-element gathers cost ~2x
        # a multi-column row per index -- continuation-session probe)
        "sc_ext": jnp.stack([starts_ext, counts_ext], axis=-1),
    }


def _band_spans(plan, search, s_valid, spec, attrs=None,
                presorted=False, tables=None):
    """Candidate x-row spans of one band's fine grid against a (possibly
    coarser-grained) shared entry packing.  ``attrs`` (n, A) rides the
    tile-id sort as extra payloads and comes back as
    ``sorted_pts`` columns 3..3+A (the packed vector path).

    ``tables``: precomputed :func:`_search_tables` for THIS band's spec
    (designated-search serving); ``search``/``s_valid``/``attrs`` are
    then ignored except for the row count.  TRUST CONTRACT like
    ``presorted``: the tables must come from the same spec object.

    ``plan`` comes from :func:`_pack_plan` on the PACK spec; ``spec`` is
    the band's own grid.  When the two specs coincide the arithmetic
    below reduces exactly to the classic single-band form (candidate
    box = the entry's coarse tiles +- one fine tile), so the span and
    packed kernels see identical spans either way.  For a band whose
    fine edge differs from the pack grid's, the fine row/column ranges
    are derived from the shared coarse-tile extents: row span
    [floor((ty*Ce - fe)/fe), ceil(((ty+1)*Ce + fe)/fe) - 1] with
    Ce = pack coarse edge, fe = band fine edge >= band max radius.
    """
    n_grid = spec.n_grid
    dims = spec.dims
    count = plan["count"]
    tx_lo, tx_hi = plan["tx_lo"], plan["tx_hi"]
    ty, tz = plan["ty"], plan["tz"]

    from nimrud_tpu.ops.pallas import gather_kernel
    from nimrud_tpu.ops.pallas.gather_kernel import LANES, _round_up
    if tables is None:
        tables = _search_tables(search, s_valid, spec, attrs=attrs,
                                presorted=presorted)
    n_search = tables["sorted_pts"].shape[0]
    sp = tables["sorted_pts"]
    sx, sy, sz = sp[:, 0], sp[:, 1], sp[:, 2]
    sa = [sp[:, 3 + i] for i in range(sp.shape[1] - 3)]

    # ratio of pack-coarse to band-fine edges; integral when the band IS
    # the pack grid (the classic case), where all index arithmetic below
    # stays exact-integer
    ratio = plan["coarse_edge"] / float(spec.tile_edge)
    span_rows = _shared_span_rows(plan, spec)
    if abs(ratio - round(ratio)) < 1e-9:
        m = int(round(ratio))
        x0 = tx_lo * m - 1
        x1 = tx_hi * m + m
        row_lo_y = ty * m - 1
        row_hi_y = ty * m + m
        row_lo_z = tz * m - 1
        row_hi_z = tz * m + m
        n_rows = m + 2
    else:
        # float path: slack guards f32 rounding at tile boundaries (the
        # masks discard any extra candidates).  The f32 product t*r32
        # carries absolute error up to t*ratio*2^-23; the 30-bit key
        # budget bounds fine-tile indices below ~2^17, so the error is
        # < 131072 * 1.2e-7 = 0.016 -- eps=0.05 provably covers it on
        # every admissible grid (1e-4 could be EXCEEDED past fine index
        # ~1700, silently dropping a boundary slop tile on both device
        # and host mirror at once)
        eps = 0.05
        r32 = jnp.float32(ratio)

        def lo_of(t):
            # first fine tile reachable below the coarse range start
            return jnp.floor(t.astype(jnp.float32) * r32
                             - (1 + eps)).astype(jnp.int32)

        def hi_of(t):
            # last fine tile reachable above the coarse range end
            return (jnp.ceil((t + 1).astype(jnp.float32) * r32
                             + (1 + eps)) - 1).astype(jnp.int32)

        x0 = lo_of(tx_lo)
        x1 = hi_of(tx_hi)
        row_lo_y = lo_of(ty)
        row_hi_y = hi_of(ty)
        row_lo_z = lo_of(tz)
        row_hi_z = hi_of(tz)
        n_rows = int(np.ceil(ratio)) + 3

    x0 = jnp.maximum(x0, 0)
    x1 = jnp.minimum(x1, dims[0] - 1)

    # --- candidate x-row spans: one contiguous segment per (dy, dz) -----
    # vectorized over the (dy, dz) row axis: a Python loop emitted 2
    # small table gathers per row (50 gather dispatches/band, measured
    # ~3.75 ms/step across the bench bands); one (E, n_rows^2) index
    # block keeps it to 2 pair-row gathers per band, same math bit for
    # bit (5.12 -> 1.23 ms/step after the sc_ext pair table below)
    dyz = jnp.arange(n_rows, dtype=jnp.int32)
    y = row_lo_y[:, None, None] + dyz[None, :, None]     # (E, dy, dz)
    z = row_lo_z[:, None, None] + dyz[None, None, :]
    ok = ((y >= 0) & (y < dims[1]) & (y <= row_hi_y[:, None, None])
          & (z >= 0) & (z < dims[2]) & (z <= row_hi_z[:, None, None])
          & (count > 0)[:, None, None])
    row = y * dims[0] + z * (dims[0] * dims[1])
    e_rows = row.shape[0]
    first = jnp.where(ok, x0[:, None, None] + row, n_grid)
    last = jnp.where(ok, x1[:, None, None] + row, n_grid)
    # two (N, 2) pair-row gathers instead of three flat gathers: the
    # same starts/counts values, index-rate-bound at the cheaper
    # multi-column rate (begin only uses column 0; the wasted count
    # column is free -- gather cost is per index, not per byte)
    sc_ext = tables["sc_ext"]
    g_first = sc_ext[first.reshape(e_rows, -1)]
    g_last = sc_ext[last.reshape(e_rows, -1)]
    begin = g_first[..., 0]
    end = g_last[..., 0] + g_last[..., 1]
    ok2 = ok.reshape(e_rows, -1)
    span_starts = jnp.where(ok2, begin, 0).astype(jnp.int32)
    span_lens = jnp.clip(end - begin, 0, span_rows).astype(jnp.int32)

    # transposed (4, n_pad) layout: points along lanes so span DMAs can
    # slice the lane dim at 128-aligned starts (span-kernel path only;
    # jit drops it when the caller uses sorted_pts instead)
    window = gather_kernel.span_window(span_rows)
    n_lanes = _round_up(n_search + window, LANES)
    sorted_t = jnp.zeros((4, n_lanes), sx.dtype)
    sorted_t = sorted_t.at[0, :n_search].set(sx)
    sorted_t = sorted_t.at[1, :n_search].set(sy)
    sorted_t = sorted_t.at[2, :n_search].set(sz)

    return {
        "span_starts": span_starts, "span_lens": span_lens,
        "sorted_t": sorted_t,
        "sorted_pts": tables["sorted_pts"],
        "span_rows": span_rows,
    }


def _shared_span_rows(plan, spec):
    """Static per-span live-point cap for a band under a shared pack
    plan: the entry's coarse-x extent in band fine tiles, plus the +-1
    fine-tile slop, times the band's per-tile cap.  Equals
    ``spec.span_rows`` when the band is its own pack grid.

    Non-integral pack/band ratios take the eps-widened float branch of
    :func:`_band_spans`, whose x-range can reach ceil(x_seg*ratio)+5
    fine tiles (floor(lo-1-eps)..ceil(hi+1+eps)-1); the +2 budget of
    the exact integer case would silently clip a maximally-populated
    span's TAIL there (uncounted -- the host mirror clips alike)."""
    ratio = plan["coarse_edge"] / float(spec.tile_edge)
    x_seg = plan["x_seg_pack"]
    slop = 2 if abs(ratio - round(ratio)) < 1e-9 else 5
    return int(np.ceil(x_seg * ratio) + slop) * spec.s_cap


def _span_problem(query, q_valid, search, s_valid, spec, attrs=None):
    """Shared plan for the span-structured Pallas paths: sort search by
    fine tile id, pack queries into sorted-rank entries over coarse-row
    segments, and derive each entry's candidate x-row spans.  Returns a
    dict consumed by :func:`fused_extract_spans` (streaming span-DMA
    kernel) and :func:`fused_extract_packed` (gathered dense candidate
    blocks); jit dead-code-eliminates whichever pieces a caller ignores.
    """
    plan = _pack_plan(query, q_valid, spec)
    plan["x_seg_pack"] = max(min(spec.x_seg, spec.qdims[0]), 1)
    band = _band_spans(plan, search, s_valid, spec, attrs=attrs)
    q_pts = jnp.swapaxes(plan["q_t"], 1, 2)           # (E, q_cap, 3)
    q_local = q_pts - plan["centers"][:, None, :]
    return {**plan, **band, "q_pts": q_pts, "q_local": q_local}


def _rank_positions(prob, spec, n_query, sentinel):
    """Sorted-rank -> (entry, slot) flat positions (MONOTONE over the
    covered ranks).  Entries are CONSECUTIVE rank blocks, so each rank's
    flat position is rank + (entry*q_cap - entry_start), propagated
    down the rank axis with one ~E-element scatter + a cummax -- this
    replaces two 1M-element small-table gathers (seg_starts/offsets
    lookups, ~10 ms/step on v5e).  Ranks without a live entry slot map
    to ``sentinel``."""
    count = prob["count"]
    start = prob["start"]
    # per-entry base, monotone along ranks (start deltas are <= q_cap);
    # dead entries never scatter
    base = prob["entry"] * spec.q_cap - start
    lowest = jnp.int32(-(2 ** 31) + 1)
    arr = jnp.full((n_query,), lowest, jnp.int32).at[
        jnp.where(count > 0, jnp.clip(start, 0, n_query - 1),
                  n_query - 1)].max(
        jnp.where(count > 0, base, lowest), mode="drop")
    pos_r = prob["q_iota"] + jax.lax.cummax(arr)
    covered = jnp.sum(count)       # entries are rank-contiguous from 0
    return jnp.where(prob["q_iota"] < covered, pos_r, sentinel)


def _rank_compact(red, plan, spec, n_rows, zero_row, n_query):
    """Reduce outputs from (entry, slot) order to SORTED-RANK order
    with ONE multi-payload key-value sort.

    Slot ``(e, s)`` owns rank ``start_e + s`` when ``s < count_e``
    (ranks are unique and contiguous from 0 over the covered prefix);
    dead slots get a max-int sentinel key and sort past every live
    rank.  This replaces the monotone position gather
    (``out[pos_r]``, ~7.5 ms/M rows on v5e -- XLA lowers it as a
    general gather) with a ~2.3 ms/M near-sorted sort.  Ranks past
    the covered prefix (queries without an entry slot) are filled
    with the reduce's zero-feature row, preserving the gather path's
    sentinel-row semantics exactly -- including under entry-capacity
    overflow, where the gather path's misaligned-key shortcut would
    silently shift every later label.
    """
    start, count = plan["start"], plan["count"]
    q_slots = spec.q_cap
    n_e = n_rows // q_slots
    if n_e > start.shape[0]:        # entry_chunk padding rows: count 0
        pad = n_e - start.shape[0]
        start = jnp.concatenate([start, jnp.zeros(pad, jnp.int32)])
        count = jnp.concatenate([count, jnp.zeros(pad, jnp.int32)])
    scol = jnp.arange(q_slots, dtype=jnp.int32)[None, :]
    keys = jnp.where(scol < count[:, None], start[:, None] + scol,
                     jnp.int32(2 ** 31 - 1)).reshape(-1)

    leaves, treedef = jax.tree_util.tree_flatten(red)
    widths, cols = [], []
    for leaf in leaves:
        flat = leaf.reshape(n_rows, -1)
        widths.append(flat.shape[1])
        cols.extend(flat[:, i] for i in range(flat.shape[1]))
    parts = jax.lax.sort((keys,) + tuple(cols), num_keys=1)[1:]

    covered = jnp.sum(plan["count"])
    live = jnp.arange(n_query, dtype=jnp.int32) < covered
    z_leaves = jax.tree_util.tree_leaves(zero_row)
    out, k = [], 0
    for leaf, z, w in zip(leaves, z_leaves, widths):
        z_flat = z.reshape(-1)
        ranked = []
        for i in range(w):
            c = parts[k + i]
            if c.shape[0] < n_query:    # trimmed e_cap smaller than
                c = jnp.concatenate(    # the query bucket
                    [c, jnp.zeros(n_query - c.shape[0], c.dtype)])
            ranked.append(jnp.where(live, c[:n_query], z_flat[i]))
        k += w
        out.append(ranked[0] if leaf.ndim == 1
                   else jnp.stack(ranked, axis=1))
    return jax.tree_util.tree_unflatten(treedef, out)


def _unsort_positions(prob, spec, n_query, sentinel):
    """Caller-order -> (entry, slot) flat positions: the rank-order
    positions scattered through the sort permutation (an int32 scatter
    is cheaper than carrying positions through one more full sort when
    the CONSUMER needs caller-order positions for a wide row gather;
    narrow label/probability unsorts take the order="rank" path and
    ride one key-value sort instead)."""
    pos_r = _rank_positions(prob, spec, n_query, sentinel)
    return jnp.full((n_query,), sentinel,
                    jnp.int32).at[prob["q_order"]].set(pos_r)


def _unsort_features(feats, prob, spec, n_query, n_out):
    """Feature rows back to caller order: positions from
    :func:`_unsort_positions`, then one row gather (a row scatter would
    cost ~50 ms/band)."""
    width = feats.shape[-1]
    flat = jnp.concatenate(
        [feats.reshape(-1, width),
         jnp.zeros((1, width), jnp.float32)])         # sentinel zero row
    pos_by_query = _unsort_positions(
        prob, spec, n_query, flat.shape[0] - 1)
    return flat[pos_by_query][:n_out]


@functools.partial(
    jax.jit,
    static_argnames=("spec", "radii", "kind", "exclude_radius",
                     "n_out", "c_cap", "interpret", "entry_batch",
                     "precision", "with_stats", "metric"))
def fused_extract_packed(query, q_valid, search, s_valid, spec, radii,
                         kind, exclude_radius, n_out, c_cap,
                         interpret=False, entry_batch=8,
                         precision="highest", with_stats=False,
                         attributes=None, metric="euclidean"):
    """
    Raw padded clouds -> feature block via the dense packed-candidate
    Pallas kernel (nimrud_tpu.ops.pallas.packed_kernel).

    Same span plan as :func:`fused_extract_spans`, but instead of
    streaming each tiny span through an in-kernel DMA ring (~1.4 us of
    scalar machinery per span -- the measured bottleneck; see
    scripts/span_stats.py), the spans are packed contiguously into one
    c_cap-lane candidate block per entry with a single fused XLA row
    gather, and the kernel is a pure grid-pipelined static sweep with
    no scalar-core work at all.

    ``c_cap`` bounds candidates per entry: one static int (multiple of
    128), or a multi-bucket ``(caps, bounds)`` split from
    span_host.candidate_caps_split (the packed attribute interp's caps
    are heavy-tailed at x_seg=1 -- the split runs each descending-total
    entry bucket at its own capacity AND entry batch, see
    :func:`_bucketed_slabs`).  Entries beyond their capacity are
    truncated and counted in the ``dropped_candidates`` stat -- size
    with :func:`packed_cap` / ``candidate_caps_split`` (measured max +
    margin) to keep the path exact.
    """
    from nimrud_tpu.features import layouts
    from nimrud_tpu.ops.pallas import multiscale_kernel

    n_attr = 0 if attributes is None else attributes.shape[1]
    prob = _span_problem(query, q_valid, search, s_valid, spec,
                         attrs=attributes)
    sorted3 = _far_extended(prob["sorted_pts"])

    sazo = layouts.needs_sazo(kind)
    slabs, dropped = _bucketed_slabs(
        prob["q_t"], prob["centers"], prob["span_starts"],
        prob["span_lens"], sorted3, c_cap, radii, exclude_radius,
        interpret, entry_batch, precision, sazo, n_attr=n_attr,
        metric=metric)
    per_radius = multiscale_kernel.moments_from_slabs(
        slabs, prob["centers"], radii, with_sazo=sazo, n_attr=n_attr)

    blocks = []
    for p, radius in zip(per_radius, radii):
        if kind == "vector":
            blocks.append(p["attr_mean"])
            continue
        blocks.append(layouts.build_block(
            kind, p["count"], p["mean_local"] + prob["centers"][:, None, :],
            p["cov"], prob["q_pts"], radius, sazo=p.get("sazo")))
    feats = jnp.concatenate(blocks, axis=-1)
    feats_out = _unsort_features(feats, prob, spec, query.shape[0], n_out)
    if not with_stats:
        return feats_out
    stats = {
        "dropped_query": (
            jnp.sum(q_valid.astype(jnp.int32)) - jnp.sum(prob["count"])
        ).astype(jnp.int32),
        "dropped_candidates": dropped,
    }
    return feats_out, stats


_GATHER_CHUNK = 4 * 1024 * 1024   # lanes per packing-gather piece: the
                                  # largest size where XLA reliably
                                  # fuses the gather+transpose (see the
                                  # LAYOUT HAZARD note in
                                  # _pack_candidates); the 1M bench
                                  # (<= 3.3M lanes/band) stays single-
                                  # shot, the 10M workload chunks


def _pack_src(starts, lens, c_cap, n_search):
    """Packed-candidate SOURCE MAP for a slice of entries: (E', c_cap)
    int32 gather indices into the FAR-extended sorted cloud, plus the
    truncation counter.

    Packs spans contiguously -- entry e's span i occupies packed slots
    [off[e,i], off[e,i]+lens[e,i]).  The slot->source map is a fused
    chain of n_span selects over (E', c_cap) -- no gather, no
    searchsorted (XLA's is a serial log(n) while loop); dead slots
    index the appended FAR sentinel row (index ``n_search``), which the
    kernel's distance masks kill for free.

    Because the packing is CONTIGUOUS (off is an exclusive cumsum of
    lens), every live slot ``j < total`` lies in exactly one span --
    the LAST span with ``off_i <= j`` -- so the map reduces to
    ``src[j] = j + (starts_k - off_k)``: one compare + one select per
    span over (E', c_cap), instead of the interval test's two compares
    + and + add + select (~3x fewer VPU ops on the hottest serving
    fusion).  Zero-length spans share an offset with their successor
    and lose the last-writer select, which is exactly right: they own
    no slots."""
    n_span = lens.shape[1]
    off = jnp.cumsum(lens, axis=1) - lens
    total = off[:, -1] + lens[:, -1]                 # (E',)
    delta = starts - off                             # (E', n_span)
    j = jnp.arange(c_cap, dtype=jnp.int32)[None, :]  # (1, c_cap)
    d = jnp.broadcast_to(delta[:, 0:1], (starts.shape[0], c_cap))
    for i in range(1, n_span):                       # off[:, 0] == 0
        d = jnp.where(j >= off[:, i:i + 1], delta[:, i:i + 1], d)
    src3 = jnp.where(j < total[:, None], j + d, n_search)
    dropped = jnp.sum(jnp.maximum(total - c_cap, 0)).astype(jnp.int32)
    return src3, dropped


def _far_extended(sorted_pts):
    """Sorted cloud plus the FAR sentinel row dead slots gather."""
    from nimrud_tpu.ops.pallas import packed_kernel
    width = sorted_pts.shape[1]                      # 3 + n_attr
    return jnp.concatenate([
        sorted_pts,
        jnp.full((1, width), packed_kernel.FAR, jnp.float32)])


def _bucket_entry_batch(base, cap):
    """Entries per kernel grid step for one capacity bucket.

    The packed kernel's scoped-VMEM stack is ~0.12 MB x entry_batch x
    ceil(c_cap/512) compute chunks against a 16 MB limit (constant
    measured from two compile-OOM probes on v5e, ROADMAP round 5), so
    large-cap callers must run few entries per step -- but with
    multi-bucket split caps only the TOP bucket is large, and the small
    buckets can unroll the default 8 entries within the budget.  Never
    returns less than ``base`` (the caller's known-good batch at its
    max cap), so single-cap behavior is unchanged."""
    chunks = -(-int(cap) // 512)
    fit = int(8.0 / (0.12 * chunks))        # ~half the 16 MB budget
    return max(base, min(8, max(fit, 1)))


def _bucketed_slabs(q_t_c, centers_c, starts_c, lens_c, sorted3, c_cap,
                    radii, exclude_radius, interpret, entry_batch,
                    precision, with_sazo, n_attr=0, metric="euclidean"):
    """Moment slabs for a slice of entries at one int capacity or at
    multi-bucket ``(caps, bounds)`` split capacities from
    span_host.candidate_caps_split.  Returns ``(slabs, dropped)``.

    Per-entry candidate totals are heavy-tailed, so one cap sized for
    the max leaves the packing gather and the kernel mostly dead; the
    split path argsorts entries by measured total and runs each
    descending-rank bucket at its own capacity (and its own
    entry-batch: small caps fit more unrolled entries in scoped VMEM).
    The slabs are un-permuted before returning, so downstream order
    never sees the sort -- results are BIT-identical to the single-cap
    path when nothing is dropped (each entry's packed block holds the
    same candidate rows in the same slots; extra dead slots accumulate
    exact zeros)."""
    if isinstance(c_cap, tuple):
        caps, bounds = c_cap
        totals = jnp.sum(lens_c, axis=1)
        order = jnp.argsort(-totals)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        edges = (0,) + tuple(
            min(b, order.shape[0]) for b in bounds) + (order.shape[0],)
        parts = []
        drop = jnp.zeros((), jnp.int32)
        for cap, a, b in zip(caps, edges[:-1], edges[1:]):
            if a >= b:
                continue
            idx = order[a:b]
            src3, dr = _pack_src(starts_c[idx], lens_c[idx], cap,
                                 sorted3.shape[0] - 1)
            parts.append(_packed_slabs(
                q_t_c[idx], centers_c[idx], src3, sorted3, radii,
                exclude_radius, interpret,
                _bucket_entry_batch(entry_batch, cap), precision,
                with_sazo, n_attr=n_attr, metric=metric))
            drop = drop + dr
        return jnp.concatenate(parts)[inv], drop
    src3, drop = _pack_src(starts_c, lens_c, c_cap,
                           sorted3.shape[0] - 1)
    slabs = _packed_slabs(
        q_t_c, centers_c, src3, sorted3, radii, exclude_radius,
        interpret, entry_batch, precision, with_sazo, n_attr=n_attr,
        metric=metric)
    return slabs, drop


def _packed_slabs(q_t, centers, src3, sorted3, radii, exclude_radius,
                  interpret, entry_batch, precision, with_sazo,
                  n_attr=0, metric="euclidean"):
    """Gather packed candidates and run the packed moment kernel,
    CHUNKED over entries for large problems.

    LAYOUT HAZARD: XLA canonicalizes every gather to batch-major
    (N, 3) before any transpose, and a MATERIALIZED f32[N, 3] is
    (8, 128)-tiled with the lane dim padded 3 -> 128 -- a 42x blowup
    (23 GB for one band of the 10M-point workload; column and
    offset-dims-first gathers canonicalize identically, and a lax.map
    over gather pieces just moves the bad layout to the stacked scan
    output).  Up to a few million lanes XLA fuses the transpose into
    the gather and the intermediate never exists.  So: one shot below
    _GATHER_CHUNK lanes, otherwise a PYTHON loop over entry slices
    where each piece's gather feeds its own kernel call immediately --
    intermediates stay bounded and are dead between pieces."""
    from nimrud_tpu.ops.pallas import packed_kernel

    e_cap, c_cap = src3.shape

    def piece(sl):
        cand_t = sorted3[src3[sl].reshape(-1)].T
        return packed_kernel.packed_moments.__wrapped__(
            q_t[sl], cand_t, centers[sl], radii, exclude_radius,
            interpret, entry_batch, precision, with_sazo=with_sazo,
            n_attr=n_attr, metric=metric)

    if e_cap * c_cap <= _GATHER_CHUNK:
        return piece(slice(None))
    e_chunk = max((_GATHER_CHUNK // c_cap) // entry_batch * entry_batch,
                  entry_batch)
    slabs = [piece(slice(i, min(i + e_chunk, e_cap)))
             for i in range(0, e_cap, e_chunk)]
    return jnp.concatenate(slabs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("pack_spec", "band_specs", "radii_bands", "kind",
                     "exclude_radius", "n_out", "c_caps", "interpret",
                     "entry_batch", "precision", "with_stats", "order",
                     "entry_chunk", "reduce_fn", "presorted"))
def fused_extract_packed_multi(query, q_valid, searches, s_valids,
                               pack_spec, band_specs, radii_bands, kind,
                               exclude_radius, n_out, c_caps,
                               interpret=False, entry_batch=8,
                               precision="highest", with_stats=False,
                               order="caller", attributes=None,
                               entry_chunk=None, reduce_fn=None,
                               reduce_args=None, presorted=False,
                               search_tables=None):
    """
    ALL bands of a scaleset in one program over ONE shared query plan.

    The per-band packed path repeats the query sort, the (E, q_cap)
    query gather, and the caller-order unsort once per band -- together
    ~60% of the measured serving step.  Here :func:`_pack_plan` runs
    once on ``pack_spec`` (the band with the finest tile edge, so its
    segment rows bound every band's candidate reach), every band
    derives its spans against the SHARED entries via the generalized
    grid-ratio arithmetic in :func:`_band_spans`, the packed kernel
    runs per band on the shared q_pts/centers, and the concatenated
    feature block unsorts once.

    ``searches`` / ``s_valids`` / ``radii_bands`` / ``band_specs`` /
    ``c_caps`` are parallel tuples, one element per band.

    ``presorted=True`` is a TRUST CONTRACT: each band's search rows must
    arrive ordered by THAT band's ``band_specs[i]`` fine-tile id with
    invalid rows last -- i.e. each must come from
    ``unique.unique_voxels(..., tile_spec=band_specs[i])`` with the same
    spec object passed here.  The span tables assume the ordering and
    are silently wrong on any other input; the fast op-level parity
    test (test_packed_presorted_search_matches_sorted) guards the one
    sanctioned producer.

    Returns (n_out, sum of band widths) features, plus the overflow
    stats dict when ``with_stats``.

    ``order="plan"`` skips the caller-order feature gather and returns
    ``(feats_flat, pos_by_query)`` instead: features in (entry, slot)
    order plus the caller-order position map (sentinel index =
    feats_flat row count).  Serving classifies the flat block and
    unsorts only the labels/probabilities -- int32/narrow gathers
    instead of the full feature width.

    ``order="rank"`` with a ``reduce_fn`` returns ``(out_rank,
    q_order)``: the reduce outputs already compacted to SORTED-RANK
    order (one in-program key-value sort; ranks without a live entry
    slot carry the reduce's zero-feature row) plus the plan's sort
    permutation.  The caller restores caller order with ONE more
    key-value sort -- ``lax.sort_key_val(q_order, out_rank[i])`` --
    two near-sorted sorts in place of the order="plan" position
    scatter + random gather (or the older rank-position gather,
    ~7.5 ms/M rows on v5e).  Without a ``reduce_fn`` it returns
    ``(feats_flat, pos_r, q_order)``: flat positions in rank order
    for a caller-side row gather (wide results gather cheaper than
    they sort).

    ``reduce_fn`` (static, hashable; order="plan" only) maps each flat
    feature block through ``reduce_fn(reduce_args, feats) -> tuple of
    (rows, ...) arrays`` INSIDE this program (serving passes the
    classifier), and the returned ``out`` is the reduced tuple with one
    extra sentinel row (the reduce of a zero-feature row -- what
    queries without an entry slot get).  With ``entry_chunk`` set, the
    whole per-entry pipeline (candidate pack + gather + kernel + layout
    + reduce) runs under ``lax.map`` in chunks of that many entries:
    at the 10M-point workload the un-chunked flat classifier input
    alone is ~8.6 GB of HBM ((8,128) tiling pads its feature lanes),
    while chunking bounds every fat per-slot buffer to the chunk.
    """
    from nimrud_tpu.features import layouts
    from nimrud_tpu.ops.pallas import multiscale_kernel

    plan = _pack_plan(query, q_valid, pack_spec)
    plan["x_seg_pack"] = max(min(pack_spec.x_seg, pack_spec.qdims[0]), 1)
    q_cap = pack_spec.q_cap
    sazo = layouts.needs_sazo(kind)
    attributes = attributes or (None,) * len(band_specs)

    # per-band span tables against the shared plan (global sorts; the
    # heavy per-slot work below consumes these chunk by chunk).
    # ``search_tables`` (designated-search serving) replaces each
    # band's dedup sort + count scatter with precomputed tables.
    search_tables = search_tables or (None,) * len(band_specs)
    band_data = []
    for search, s_valid, spec, radii, c_cap, attrs, stab in zip(
            searches, s_valids, band_specs, radii_bands, c_caps,
            attributes, search_tables):
        n_attr = 0 if attrs is None else attrs.shape[1]
        if stab is not None:
            n_attr = stab["sorted_pts"].shape[1] - 3
        band = _band_spans(plan, search, s_valid, spec, attrs=attrs,
                           presorted=presorted and attrs is None,
                           tables=stab)
        band_data.append((band["span_starts"], band["span_lens"],
                          _far_extended(band["sorted_pts"]), c_cap,
                          radii, n_attr))

    def band_blocks(q_t_c, centers_c, starts_c, lens_c, sorted3, c_cap,
                    radii, n_attr):
        """Feature blocks of one band for a slice of entries.

        ``c_cap`` is either one int capacity, or a multi-bucket split
        ``(caps, bounds)`` from span_host.candidate_caps_split:
        per-entry candidate totals are heavy-tailed (1M bench: p87.5 is
        ~5x below the max), so the entries are argsorted by measured
        total and each descending-rank bucket runs at its own capacity
        (1M bench: 2 buckets 3.03M lanes, 4 buckets 2.25M vs 2.16M
        single-cap x e_cap = 6.1M) -- fewer packing-gather and kernel
        lanes for the same exact results.  The slabs are un-permuted
        before the layouts, so positions and downstream order never
        see the sort.  ``bounds`` past a short (ragged last) chunk
        clip to the chunk and empty buckets drop out statically.
        """
        slabs, drop = _bucketed_slabs(
            q_t_c, centers_c, starts_c, lens_c, sorted3, c_cap, radii,
            exclude_radius, interpret, entry_batch, precision, sazo,
            n_attr=n_attr)
        per_radius = multiscale_kernel.moments_from_slabs(
            slabs, centers_c, radii, with_sazo=sazo, n_attr=n_attr)
        q_pts_c = jnp.swapaxes(q_t_c, 1, 2)
        blocks = []
        for p, radius in zip(per_radius, radii):
            if kind == "vector":
                blocks.append(p["attr_mean"])
                continue
            blocks.append(layouts.build_block(
                kind, p["count"],
                p["mean_local"] + centers_c[:, None, :],
                p["cov"], q_pts_c, radius, sazo=p.get("sazo")))
        return blocks, drop

    if kind == "vector":
        width_total = sum(b[5] * len(b[4]) for b in band_data)
    else:
        width_total = layouts.LAYOUT_WIDTHS[kind] \
            * sum(len(b[4]) for b in band_data)

    if order in ("plan", "rank") and reduce_fn is not None \
            and entry_chunk is not None \
            and pack_spec.e_cap > entry_chunk:
        pad_e = -pack_spec.e_cap % entry_chunk
        n_chunks = (pack_spec.e_cap + pad_e) // entry_chunk

        def pad_entries(a):
            if not pad_e:
                return a
            return jnp.concatenate(
                [a, jnp.zeros((pad_e,) + a.shape[1:], a.dtype)])

        xs = {
            "q_t": pad_entries(plan["q_t"]).reshape(
                n_chunks, entry_chunk, 3, q_cap),
            "centers": pad_entries(plan["centers"]).reshape(
                n_chunks, entry_chunk, 3),
            "starts": tuple(pad_entries(b[0]).reshape(
                n_chunks, entry_chunk, -1) for b in band_data),
            "lens": tuple(pad_entries(b[1]).reshape(
                n_chunks, entry_chunk, -1) for b in band_data),
        }

        def chunk_body(x):
            blocks = []
            drop = jnp.zeros((), jnp.int32)
            for bi, (_, _, sorted3, c_cap, radii, n_attr) in enumerate(
                    band_data):
                bl, dr = band_blocks(
                    x["q_t"], x["centers"], x["starts"][bi],
                    x["lens"][bi], sorted3, c_cap, radii, n_attr)
                blocks.extend(bl)
                drop = drop + dr
            feats_c = jnp.concatenate(blocks, axis=-1)
            flat_c = feats_c.reshape(-1, feats_c.shape[-1])
            return reduce_fn(reduce_args, flat_c), drop

        if interpret:
            # CPU tests: scan-of-interpreted-pallas programs have
            # crashed XLA:CPU's compiler deep into long pytest
            # sessions; an unrolled loop compiles the same math without
            # the scan (the TPU path below keeps lax.map -- one traced
            # body regardless of chunk count)
            stacked = [chunk_body(jax.tree_util.tree_map(
                lambda a: a[i], xs)) for i in range(n_chunks)]
            outs = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves),
                *[s[0] for s in stacked])
            drops = jnp.stack([s[1] for s in stacked])
        else:
            outs, drops = jax.lax.map(chunk_body, xs)
        n_rows = n_chunks * entry_chunk * q_cap
        zero_row = reduce_fn(
            reduce_args, jnp.zeros((1, width_total), jnp.float32))
        if order == "rank":
            # rank-order compaction by ONE key-value sort + the sort
            # permutation: the caller restores caller order with one
            # more key-value sort of the narrow results
            red = jax.tree_util.tree_map(
                lambda a: a.reshape((n_rows,) + a.shape[2:]), outs)
            out = (_rank_compact(red, plan, pack_spec, n_rows,
                                 zero_row, query.shape[0]),
                   plan["q_order"])
        else:
            out_flat = jax.tree_util.tree_map(
                lambda a, z: jnp.concatenate(
                    [a.reshape((n_rows,) + a.shape[2:]), z]),
                outs, zero_row)
            pos = _unsort_positions(
                plan, pack_spec, query.shape[0], n_rows)[:n_out]
            out = (out_flat, pos)
        dropped = jnp.sum(drops).astype(jnp.int32)
    else:
        blocks = []
        dropped = jnp.zeros((), jnp.int32)
        for starts, lens, sorted3, c_cap, radii, n_attr in band_data:
            bl, dr = band_blocks(plan["q_t"], plan["centers"], starts,
                                 lens, sorted3, c_cap, radii, n_attr)
            blocks.extend(bl)
            dropped = dropped + dr
        feats = jnp.concatenate(blocks, axis=-1)
        if order in ("plan", "rank"):
            width = feats.shape[-1]
            flat = feats.reshape(-1, width)
            if reduce_fn is not None:
                red = reduce_fn(reduce_args, flat)
                zero_row = reduce_fn(
                    reduce_args, jnp.zeros((1, width), jnp.float32))
                if order == "rank":
                    out = (_rank_compact(red, plan, pack_spec,
                                         flat.shape[0], zero_row,
                                         query.shape[0]),
                           plan["q_order"])
                else:
                    out_flat = jax.tree_util.tree_map(
                        lambda a, z: jnp.concatenate([a, z]),
                        red, zero_row)
                    pos = _unsort_positions(
                        plan, pack_spec, query.shape[0],
                        flat.shape[0])[:n_out]
                    out = (out_flat, pos)
            elif order == "rank":
                pos = _rank_positions(
                    plan, pack_spec, query.shape[0], flat.shape[0])
                out = (flat, pos, plan["q_order"])
            else:
                pos = _unsort_positions(
                    plan, pack_spec, query.shape[0],
                    flat.shape[0])[:n_out]
                out = (flat, pos)
        else:
            out = _unsort_features(
                feats, plan, pack_spec, query.shape[0], n_out)
    if not with_stats:
        return out
    stats = {
        "dropped_query": (
            jnp.sum(q_valid.astype(jnp.int32)) - jnp.sum(plan["count"])
        ).astype(jnp.int32),
        "dropped_candidates": dropped,
    }
    return out, stats


@functools.partial(jax.jit, static_argnames=("spec",))
def _max_candidates(query, q_valid, search, s_valid, spec):
    prob = _span_problem(query, q_valid, search, s_valid, spec)
    return jnp.max(jnp.sum(prob["span_lens"], axis=1))


def packed_cap(query, q_valid, search, s_valid, spec, margin=1.25):
    """Measured per-entry candidate maximum for this (cloud, spec),
    with headroom, rounded up to a 128-lane multiple -- the ``c_cap``
    at which :func:`fused_extract_packed` is exact on this cloud and
    robust to moderate densification at serving time."""
    from nimrud_tpu.ops.pallas.gather_kernel import _round_up
    m = int(_max_candidates(query, q_valid, search, s_valid, spec))
    return max(_round_up(max(int(m * margin), 1), 128), 128)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "radii", "kind", "exclude_radius",
                     "precision_name", "n_out", "with_stats", "metric"))
def fused_extract(query, q_valid, search, s_valid, spec, radii, kind,
                  exclude_radius, precision_name, n_out,
                  with_stats=False, attributes=None, metric="euclidean"):
    """
    Raw padded clouds -> feature block (n_out, width), one jit: build the
    plan on device, run the masked-moment kernel, apply the layout,
    scatter to caller order.  ``with_stats`` additionally returns the
    overflow counters from :func:`build_tables` (dropped_search /
    dropped_query int32 scalars) as a second output.

    ``attributes`` (rows aligned with ``search``) enables the attribute
    layouts -- kind="vector" returns per-radius masked attribute means
    (the V_MSO path); ``metric="chebyshev"`` turns the kernel into the
    voxel-interpolation operator (attribute mean over the Chebyshev ball,
    the reference's vec_field_interp).
    """
    tables = build_tables(
        query, q_valid, search, s_valid, spec, with_stats=with_stats)
    query_index, neighbor_rows, candidates, centers = tables[:4]
    has_attr = attributes is not None
    attr = attributes if has_attr \
        else jnp.zeros((search.shape[0], 0), jnp.float32)
    feats = host_grid._tiled_features_kernel.__wrapped__(
        query, search, attr,
        query_index, neighbor_rows, candidates, centers,
        radii, exclude_radius, kind, has_attr,
        spec.entry_batch, n_out,
        host_grid.PRECISIONS[precision_name],
        "xla", False, metric)
    if with_stats:
        return feats, tables[4]
    return feats
