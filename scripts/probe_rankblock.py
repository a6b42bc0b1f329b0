"""
HOST-MIRROR PRE-SCREEN for the rank-block plan (round-4 structural
probe, VERDICT item 1): entries = fixed q_cap-rank blocks of the
FINE-tile-sorted query array instead of rank blocks within coarse-row
segments.

What it buys (if candidate lanes hold): the (E, q_cap) q_t gather
becomes a reshape (6.25 ms/step), the segment head/scan plan block and
the rank-compaction keys simplify (~5 ms), and span-bound lookups drop
from 66 to ~41 rows/entry.  What it risks: blocks that straddle tile
LINES (y or z wraps in the sorted order) get conservative candidate
boxes -- this script MEASURES that cost on the bench cloud before any
device code is written.

Span scheme per entry (tile range [ta, tb] on the pack fine grid):
  k=0   same line            -> tight (n_rows^2)-row block, tight x
  k>=1  same z-slab          -> ONE span: y-range box, full x
  z-crossing                 -> TWO spans: za piece + [za+1..zb] slabs
All spans are ranges of the band-tile-sorted search array; overlap is
clamped so no candidate is ever double-counted.

Prints lane totals under the same multi-bucket cap optimizer production
uses, vs the current segment plan's lanes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from nimrud_tpu.ops import span_host
from nimrud_tpu.ops import device_grid
from nimrud_tpu.utils.workload import (
    BENCH_EDGES, BENCH_RADII, make_bench_cloud)


def rankblock_plan_np(query, spec, q_cap):
    """Fixed-rank-block plan mirror: sort by FINE tile id."""
    t_ids = span_host.encode_np(query, spec, coarse=False)
    order = np.argsort(t_ids, kind="stable")
    sorted_tids = t_ids[order]
    n = query.shape[0]
    n_e = -(-n // q_cap)
    start = np.arange(n_e) * q_cap
    count = np.clip(n - start, 0, q_cap)
    first = sorted_tids[np.clip(start, 0, n - 1)]
    last = sorted_tids[np.clip(start + count - 1, 0, n - 1)]
    return {"first": first, "last": last, "count": count,
            "pack_dims": spec.dims, "pack_edge": spec.tile_edge}


def _lo_hi_fns(ratio):
    if abs(ratio - round(ratio)) < 1e-9:
        m = int(round(ratio))

        def lo_of(t):
            return t * m - 1

        def hi_of(t):
            return t * m + m
    else:
        eps = 0.05
        r32 = np.float32(ratio)

        def lo_of(t):
            return np.floor(t.astype(np.float32) * r32
                            - (1 + eps)).astype(np.int64)

        def hi_of(t):
            return (np.ceil((t + 1).astype(np.float32) * r32
                            + (1 + eps)) - 1).astype(np.int64)
    return lo_of, hi_of


def rankblock_band_lens(plan, search, s_valid, spec):
    """Per-entry candidate span lengths for one band under the
    rank-block scheme.  Returns (lens matrix, case counts)."""
    n_grid = spec.n_grid
    dims = spec.dims
    s_ids = np.where(np.asarray(s_valid),
                     span_host.encode_np(search, spec, coarse=False),
                     n_grid)
    s_counts = np.zeros(n_grid + 1, np.int64)
    np.add.at(s_counts, s_ids, 1)
    s_counts = s_counts[:n_grid]
    s_starts = np.concatenate([[0], np.cumsum(s_counts)[:-1]])
    starts_ext = np.concatenate([s_starts, [0]])
    counts_ext = np.concatenate([s_counts, [0]])
    ends_ext = starts_ext + counts_ext

    dxp, dyp, dzp = plan["pack_dims"]
    first, last, count = plan["first"], plan["last"], plan["count"]
    xa = first % dxp
    la = first // dxp
    ya, za = la % dyp, la // dyp
    xb = last % dxp
    lb = last // dxp
    yb, zb = lb % dyp, lb // dyp

    ratio = plan["pack_edge"] / float(spec.tile_edge)
    lo_of, hi_of = _lo_hi_fns(ratio)
    if abs(ratio - round(ratio)) < 1e-9:
        n_rows = int(round(ratio)) + 2
    else:
        n_rows = int(np.ceil(ratio)) + 3

    live = count > 0
    k0 = (la == lb) & live
    samez = (za == zb) & (la != lb) & live
    cross = (za != zb) & live

    def linear(x, y, z):
        return (np.clip(x, 0, dims[0] - 1)
                + np.clip(y, 0, dims[1] - 1) * dims[0]
                + np.clip(z, 0, dims[2] - 1) * dims[0] * dims[1])

    lens = []
    # --- case A: tight row block -------------------------------------
    x0 = np.maximum(lo_of(xa), 0)
    x1 = np.minimum(hi_of(xb), dims[0] - 1)
    for dy in range(n_rows):
        for dz in range(n_rows):
            y = lo_of(ya) + dy
            z = lo_of(za) + dz
            ok = (k0 & (y >= 0) & (y < dims[1]) & (y <= hi_of(ya))
                  & (z >= 0) & (z < dims[2]) & (z <= hi_of(za)))
            row = y * dims[0] + z * dims[0] * dims[1]
            f = np.where(ok, x0 + row, n_grid)
            l_ = np.where(ok, x1 + row, n_grid)
            lens.append(np.where(ok, np.clip(
                ends_ext[l_] - starts_ext[f], 0, None), 0))

    # --- case B: same-z y-range box, one span ------------------------
    bT_lo = linear(0, np.maximum(lo_of(ya), 0), np.maximum(lo_of(za), 0))
    bT_hi = linear(dims[0] - 1, np.minimum(hi_of(yb), dims[1] - 1),
                   np.minimum(hi_of(za), dims[2] - 1))
    b_len = np.where(samez, np.clip(
        ends_ext[bT_hi] - starts_ext[bT_lo], 0, None), 0)

    # --- case C: z-crossing, two spans --------------------------------
    c1_lo = linear(0, np.maximum(lo_of(ya), 0), np.maximum(lo_of(za), 0))
    c1_hi = linear(dims[0] - 1, dims[1] - 1,
                   np.minimum(hi_of(za), dims[2] - 1))
    c2_lo = linear(0, 0, np.maximum(lo_of(za + 1), 0))
    c2_hi = linear(dims[0] - 1, dims[1] - 1,
                   np.minimum(hi_of(zb), dims[2] - 1))
    c1_b, c1_e = starts_ext[c1_lo], ends_ext[c1_hi]
    c2_b = np.maximum(starts_ext[c2_lo], c1_e)          # no overlap
    c2_e = np.maximum(ends_ext[c2_hi], c2_b)
    c1_len = np.where(cross, np.clip(c1_e - c1_b, 0, None), 0)
    c2_len = np.where(cross, np.clip(c2_e - c2_b, 0, None), 0)

    lens[0] = lens[0] + b_len + c1_len     # reuse slots 0/1 for B/C
    lens[1] = lens[1] + c2_len
    mat = np.stack(lens, axis=1)
    return mat, {"k0": int(k0.sum()), "samez": int(samez.sum()),
                 "cross": int(cross.sum()), "rows": n_rows * n_rows}


def bucket_lanes(totals, entry_chunk=None, max_buckets=4):
    """Same optimizer as span_host.candidate_caps_split, returning the
    lane total it would commit to."""
    import itertools
    e_cap = totals.shape[0]
    chunk = e_cap if entry_chunk is None else int(entry_chunk)
    margin = 1.25
    c_hi = span_host._round_cap(max(int(totals.max()) * margin, 1))
    parts = [np.sort(totals[s:s + chunk])[::-1]
             for s in range(0, e_cap, chunk)]

    def rank_cap(r):
        if r == 0:
            return c_hi
        need = max((int(p[r]) for p in parts if len(p) > r), default=0)
        return span_host._round_cap(max(need * margin, 1))

    def lanes_of(bounds):
        edges = (0,) + bounds + (chunk,)
        caps = tuple(rank_cap(a) for a in edges[:-1])
        total = 0
        for cap, a, b in zip(caps, edges[:-1], edges[1:]):
            n = sum(min(b, len(p)) - min(a, len(p)) for p in parts)
            total += n * cap
        return total, caps

    cand = []
    k = 8
    while k < chunk:
        cand.append(k)
        k *= 2
    single = e_cap * c_hi
    best = {1: (single, (), (c_hi,))}
    for n_cuts in range(1, max_buckets):
        opt = None
        for cuts in itertools.combinations(cand, n_cuts):
            lanes, caps = lanes_of(cuts)
            if opt is None or lanes < opt[0]:
                opt = (lanes, cuts, caps)
        if opt is None:
            break
        best[n_cuts + 1] = opt
    pick = 1
    if 2 in best and best[2][0] <= 0.75 * single:
        pick = 2
        for k_b in range(3, max_buckets + 1):
            if k_b in best and best[k_b][0] <= 0.90 * best[pick][0]:
                pick = k_b
    return best[pick][0], best[pick][2]


def host_unique_voxels(points, edge):
    from nimrud_tpu.features.multiscale import _host_unique_voxels
    return _host_unique_voxels(points, edge)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cloud, _ = make_bench_cloud(n=n)
    q3 = cloud[:, :3].astype(np.float32)
    lo = q3.min(0).astype(np.float64)
    hi = q3.max(0).astype(np.float64)

    # current production specs (mirrors pipeline._fused_band_specs)
    dev_specs = [device_grid.make_spec(
        lo, hi, max(r), n_query=2 ** 20, voxel_edge=e, q_cap=512, m=3,
        x_seg=32) for e, r in zip(BENCH_EDGES,
                                  [(r,) for r in BENCH_RADII])]
    pack = min(dev_specs, key=lambda s: s.tile_edge)

    searches = [host_unique_voxels(q3, e) for e in BENCH_EDGES]
    for s, e in zip(searches, BENCH_EDGES):
        print(f"band edge {e}: {len(s)} voxels", flush=True)

    # --- baseline: current segment plan lanes -------------------------
    t0 = time.time()
    plan_cur = span_host.pack_plan_np(q3, np.ones(n, bool), pack)
    base_total = 0
    for spec, srch in zip(dev_specs, searches):
        lens = span_host.band_span_lens(
            plan_cur, srch, np.ones(len(srch), bool), spec)
        lanes, caps = bucket_lanes(lens.sum(axis=1))
        base_total += lanes
        print(f"  [current] band {spec.tile_edge}: lanes {lanes}"
              f" caps {caps}", flush=True)
    print(f"[current segment plan] total lanes {base_total} "
          f"e_cap {pack.e_cap} ({time.time() - t0:.0f}s)", flush=True)

    # --- rank-block plan at several q_caps ----------------------------
    for q_cap in (256, 512, 1024):
        t0 = time.time()
        plan = rankblock_plan_np(q3, pack, q_cap)
        n_e = plan["count"].shape[0]
        total = 0
        cases = None
        for spec, srch in zip(dev_specs, searches):
            mat, cs = rankblock_band_lens(
                plan, srch, np.ones(len(srch), bool), spec)
            lanes, caps = bucket_lanes(mat.sum(axis=1))
            total += lanes
            cases = cs
            print(f"  [rankblock q{q_cap}] band {spec.tile_edge}: "
                  f"lanes {lanes} caps {caps} cases {cs}", flush=True)
        print(f"[rankblock q{q_cap}] total lanes {total} entries {n_e} "
              f"vs current {base_total} "
              f"({total / base_total:.2f}x) ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__" and "--morton" not in sys.argv and "--tiered" not in sys.argv:
    main()


# ---------------------------------------------------------------------
# Variant 2: MORTON-ordered rank blocks.  Queries sort by the Morton
# (bit-interleaved) code of their pack-grid fine cell, so a q_cap block
# of consecutive ranks is spatially COMPACT; its candidate box is the
# per-entry min/max of the actual query cells (+-1 fringe), computed by
# a reshape + axis min/max -- no segments, no q_t gather, no plan scans.
# Rows per entry are data-dependent (box size); this mirror measures
# the row distribution to pick a static budget, and the EXACT lane
# totals (tight per-row x) to compare against the segment plan.
# ---------------------------------------------------------------------

def _morton3(cx, cy, cz, bits=10):
    code = np.zeros(cx.shape, np.int64)
    for b in range(bits):
        code |= ((cx >> b) & 1) << (3 * b)
        code |= ((cy >> b) & 1) << (3 * b + 1)
        code |= ((cz >> b) & 1) << (3 * b + 2)
    return code


def morton_block_stats(q3, pack, dev_specs, searches, q_cap,
                       row_cap=64):
    lo = np.asarray(pack.lo, np.float32)
    cell = np.floor((q3 - lo) / np.float32(pack.tile_edge)).astype(
        np.int64)
    cell = np.clip(cell, 0, np.asarray(pack.dims) - 1)
    code = _morton3(cell[:, 0], cell[:, 1], cell[:, 2])
    order = np.argsort(code, kind="stable")
    cs = cell[order]
    n = q3.shape[0]
    n_e = -(-n // q_cap)
    pad = n_e * q_cap - n
    if pad:
        cs = np.concatenate([cs, np.tile(cs[-1:], (pad, 1))])
    blocks = cs.reshape(n_e, q_cap, 3)
    bmin = blocks.min(axis=1)            # (E, 3) pack-cell bounds
    bmax = blocks.max(axis=1)

    total_all = 0
    for spec, srch in zip(dev_specs, searches):
        n_grid = spec.n_grid
        dims = spec.dims
        s_ids = span_host.encode_np(srch, spec, coarse=False)
        s_counts = np.zeros(n_grid + 1, np.int64)
        np.add.at(s_counts, s_ids, 1)
        s_counts = s_counts[:n_grid]
        s_starts = np.concatenate([[0], np.cumsum(s_counts)[:-1]])
        starts_ext = np.concatenate([s_starts, [0]])
        ends_ext = starts_ext + np.concatenate([s_counts, [0]])

        ratio = pack.tile_edge / float(spec.tile_edge)
        lo_of, hi_of = _lo_hi_fns(ratio)
        y0 = np.maximum(lo_of(bmin[:, 1]), 0)
        y1 = np.minimum(hi_of(bmax[:, 1]), dims[1] - 1)
        z0 = np.maximum(lo_of(bmin[:, 2]), 0)
        z1 = np.minimum(hi_of(bmax[:, 2]), dims[2] - 1)
        x0 = np.maximum(lo_of(bmin[:, 0]), 0)
        x1 = np.minimum(hi_of(bmax[:, 0]), dims[0] - 1)
        rows_needed = (y1 - y0 + 1) * (z1 - z0 + 1)
        totals = np.zeros(n_e, np.int64)
        max_dy = int((y1 - y0).max()) + 1
        max_dz = int((z1 - z0).max()) + 1
        for dy in range(max_dy):
            y = y0 + dy
            oky = y <= y1
            for dz in range(max_dz):
                z = z0 + dz
                ok = oky & (z <= z1)
                row = y * dims[0] + z * dims[0] * dims[1]
                f = np.where(ok, x0 + row, n_grid)
                l_ = np.where(ok, x1 + row, n_grid)
                totals += np.where(ok, np.clip(
                    ends_ext[l_] - starts_ext[f], 0, None), 0)
        lanes, caps = bucket_lanes(totals)
        q = np.percentile(rows_needed, [50, 90, 99, 100])
        over = int((rows_needed > row_cap).sum())
        print(f"  [morton q{q_cap}] band {spec.tile_edge}: lanes "
              f"{lanes} caps {caps} rows p50/90/99/max "
              f"{q.astype(int).tolist()} >budget({row_cap}): {over}",
              flush=True)
        total_all += lanes
    print(f"[morton q{q_cap}] total lanes {total_all} entries {n_e}",
          flush=True)
    return total_all


def main2():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cloud, _ = make_bench_cloud(n=n)
    q3 = cloud[:, :3].astype(np.float32)
    lo = q3.min(0).astype(np.float64)
    hi = q3.max(0).astype(np.float64)
    dev_specs = [device_grid.make_spec(
        lo, hi, max(r), n_query=2 ** 20, voxel_edge=e, q_cap=512, m=3,
        x_seg=32) for e, r in zip(BENCH_EDGES,
                                  [(r,) for r in BENCH_RADII])]
    pack = min(dev_specs, key=lambda s: s.tile_edge)
    searches = [host_unique_voxels(q3, e) for e in BENCH_EDGES]
    for q_cap in (256, 512, 1024):
        morton_block_stats(q3, pack, dev_specs, searches, q_cap)

    # segment-plan q_cap sweep (current design, bigger entries)
    for q_cap in (1024, 2048):
        specs_q = [device_grid.make_spec(
            lo, hi, max(r), n_query=2 ** 20, voxel_edge=e,
            q_cap=q_cap, m=3, x_seg=32)
            for e, r in zip(BENCH_EDGES, [(r,) for r in BENCH_RADII])]
        pk = min(specs_q, key=lambda s: s.tile_edge)
        plan = span_host.pack_plan_np(q3, np.ones(n, bool), pk)
        live = int(plan["count"].astype(bool).sum())
        tot = 0
        for spec, srch in zip(specs_q, searches):
            lens = span_host.band_span_lens(
                plan, srch, np.ones(len(srch), bool), spec)
            lanes, caps = bucket_lanes(lens.sum(axis=1))
            tot += lanes
            print(f"  [segment q{q_cap}] band {spec.tile_edge}: lanes "
                  f"{lanes} caps {caps}", flush=True)
        print(f"[segment q{q_cap}] total lanes {tot} live entries "
              f"{live} e_cap {pk.e_cap} fill "
              f"{n / max(live, 1) / q_cap:.2f}", flush=True)


if __name__ == "__main__" and "--morton" in sys.argv and "--tiered" not in sys.argv:
    main2()


def morton_tiered_stats(q3, pack, dev_specs, searches, q_cap,
                        row_cap=48):
    """Morton rank blocks with the STATIC row budget the device would
    run: boxes fitting row_cap rows get exact (tight-x) rows; larger
    boxes fall back to z-strips (consecutive-line spans, full-x on
    intermediate lines) when (bz+2) strips fit, else ONE bounding span.
    Lane totals here are exactly what the device plan would gather."""
    lo = np.asarray(pack.lo, np.float32)
    cell = np.floor((q3 - lo) / np.float32(pack.tile_edge)).astype(
        np.int64)
    cell = np.clip(cell, 0, np.asarray(pack.dims) - 1)
    code = _morton3(cell[:, 0], cell[:, 1], cell[:, 2])
    order = np.argsort(code, kind="stable")
    cs = cell[order]
    n = q3.shape[0]
    n_e = -(-n // q_cap)
    pad = n_e * q_cap - n
    if pad:
        cs = np.concatenate([cs, np.tile(cs[-1:], (pad, 1))])
    blocks = cs.reshape(n_e, q_cap, 3)
    bmin = blocks.min(axis=1)
    bmax = blocks.max(axis=1)

    total_all = 0
    for spec, srch in zip(dev_specs, searches):
        n_grid = spec.n_grid
        dims = spec.dims
        s_ids = span_host.encode_np(srch, spec, coarse=False)
        s_counts = np.zeros(n_grid + 1, np.int64)
        np.add.at(s_counts, s_ids, 1)
        s_counts = s_counts[:n_grid]
        s_starts = np.concatenate([[0], np.cumsum(s_counts)[:-1]])
        starts_ext = np.concatenate([s_starts, [0]])
        ends_ext = starts_ext + np.concatenate([s_counts, [0]])

        ratio = pack.tile_edge / float(spec.tile_edge)
        lo_of, hi_of = _lo_hi_fns(ratio)
        y0 = np.maximum(lo_of(bmin[:, 1]), 0)
        y1 = np.minimum(hi_of(bmax[:, 1]), dims[1] - 1)
        z0 = np.maximum(lo_of(bmin[:, 2]), 0)
        z1 = np.minimum(hi_of(bmax[:, 2]), dims[2] - 1)
        x0 = np.maximum(lo_of(bmin[:, 0]), 0)
        x1 = np.minimum(hi_of(bmax[:, 0]), dims[0] - 1)
        by = y1 - y0 + 1
        bz = z1 - z0 + 1
        rows_needed = by * bz
        tier1 = rows_needed <= row_cap
        tier2 = ~tier1 & (bz <= row_cap)
        tier3 = ~tier1 & ~tier2

        def lin(x, y, z):
            return x + y * dims[0] + z * dims[0] * dims[1]

        totals = np.zeros(n_e, np.int64)
        # tier 1: exact rows
        for dy in range(int(by[tier1].max(initial=1))):
            for dz in range(int(bz[tier1].max(initial=1))):
                y = y0 + dy
                z = z0 + dz
                ok = tier1 & (y <= y1) & (z <= z1)
                f = np.where(ok, lin(x0, y, z), n_grid)
                l_ = np.where(ok, lin(x1, y, z), n_grid)
                totals += np.where(ok, np.clip(
                    ends_ext[l_] - starts_ext[f], 0, None), 0)
        # tier 2: z-strips (full lines between y0..y1 per z)
        for dz in range(int(bz[tier2].max(initial=1))):
            z = z0 + dz
            ok = tier2 & (z <= z1)
            f = np.where(ok, lin(x0, y0, z), n_grid)
            l_ = np.where(ok, lin(x1, y1, z), n_grid)
            totals += np.where(ok, np.clip(
                ends_ext[l_] - starts_ext[f], 0, None), 0)
        # tier 3: one bounding span
        f = np.where(tier3, lin(x0, y0, z0), n_grid)
        l_ = np.where(tier3, lin(x1, y1, z1), n_grid)
        totals += np.where(tier3, np.clip(
            ends_ext[l_] - starts_ext[f], 0, None), 0)

        lanes, caps = bucket_lanes(totals)
        print(f"  [morton-tiered q{q_cap} R{row_cap}] band "
              f"{spec.tile_edge}: lanes {lanes} caps {caps} tiers "
              f"{int(tier1.sum())}/{int(tier2.sum())}/"
              f"{int(tier3.sum())}", flush=True)
        total_all += lanes
    print(f"[morton-tiered q{q_cap} R{row_cap}] total lanes "
          f"{total_all} entries {n_e}", flush=True)
    return total_all


def main3():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cloud, _ = make_bench_cloud(n=n)
    q3 = cloud[:, :3].astype(np.float32)
    lo = q3.min(0).astype(np.float64)
    hi = q3.max(0).astype(np.float64)
    dev_specs = [device_grid.make_spec(
        lo, hi, max(r), n_query=2 ** 20, voxel_edge=e, q_cap=512, m=3,
        x_seg=32) for e, r in zip(BENCH_EDGES,
                                  [(r,) for r in BENCH_RADII])]
    pack = min(dev_specs, key=lambda s: s.tile_edge)
    searches = [host_unique_voxels(q3, e) for e in BENCH_EDGES]

    plan_cur = span_host.pack_plan_np(q3, np.ones(n, bool), pack)
    base_total = 0
    for spec, srch in zip(dev_specs, searches):
        lens = span_host.band_span_lens(
            plan_cur, srch, np.ones(len(srch), bool), spec)
        lanes, _ = bucket_lanes(lens.sum(axis=1))
        base_total += lanes
    print(f"[current segment plan] total lanes {base_total}",
          flush=True)
    for q_cap in (512, 1024):
        for row_cap in (32, 48, 64):
            morton_tiered_stats(q3, pack, dev_specs, searches, q_cap,
                                row_cap)


if __name__ == "__main__" and "--tiered" in sys.argv:
    main3()
