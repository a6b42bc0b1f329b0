"""
HOST-MIRROR PRE-SCREEN for cross-entry candidate reuse (round-4
structural probe, VERDICT item 1 design (b)): process (query coarse
tile x tile offset) pairs so each search row is fetched once per
QUERY COARSE TILE instead of once per rank-block entry.

The current segment plan's entries are q_cap rank blocks whose
candidate boxes span [tx_lo-1, tx_hi+1] x 3 x 3 coarse tiles; entries
overlapping the same tiles re-fetch those tiles' rows.  The reuse
scheme makes the coarse tile itself the entry: its queries are the
tile's residents (variable count -> bucketed static q caps), its
candidates the (m+2)^3 fine-tile box (bucketed static candidate caps).

This script MEASURES, on the bench cloud, per band:
  * exact candidate fetch lanes  sum_t box_rows(t)     (zero-cap bound)
  * bucketed candidate lanes     (production cap optimizer)
  * q-side lanes                 sum_t qcap_bucket(t)  vs 1M + fill
  * exact kernel pair work       sum_t q_rows(t) * box_rows(t)
against the current plan's lanes / pair work, BEFORE any device code.

Verdict recorded in ROADMAP.md's round-4 probe ledger.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from nimrud_tpu.ops import device_grid, span_host
from nimrud_tpu.utils.workload import (
    BENCH_EDGES, BENCH_RADII, make_bench_cloud)
from probe_rankblock import bucket_lanes, host_unique_voxels


def tile_plan_np(q3, pack):
    """Plan whose entries are the LIVE coarse tiles of the pack grid:
    tx_lo == tx_hi == the tile's x, count = resident queries."""
    qd = pack.qdims
    cid = span_host.encode_np(q3, pack, coarse=True)
    n_qgrid = pack.n_qgrid
    counts = np.zeros(n_qgrid, np.int64)
    np.add.at(counts, cid, 1)
    live = np.nonzero(counts)[0]
    tx = live % qd[0]
    rest = live // qd[0]
    return {
        "tx_lo": tx, "tx_hi": tx,
        "ty": rest % qd[1], "tz": rest // qd[1],
        "count": counts[live],
        "coarse_edge": float(pack.m) * float(pack.tile_edge),
        "x_seg_pack": 1,
    }


def main():
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

    # --- baseline: current segment plan -------------------------------
    t0 = time.time()
    plan_cur = span_host.pack_plan_np(q3, np.ones(n, bool), pack)
    base_lanes = 0
    base_pairs = 0
    for spec, srch in zip(dev_specs, searches):
        lens = span_host.band_span_lens(
            plan_cur, srch, np.ones(len(srch), bool), spec)
        lanes, caps = bucket_lanes(lens.sum(axis=1))
        base_lanes += lanes
        base_pairs += lanes * pack.q_cap
        print(f"  [current] band {spec.tile_edge}: lanes {lanes} "
              f"caps {caps}", flush=True)
    live_e = int(plan_cur["live_e"].sum())
    q_lanes_cur = live_e * pack.q_cap
    print(f"[current] cand lanes {base_lanes}  q lanes {q_lanes_cur} "
          f"(fill {n / q_lanes_cur:.2f})  pair work {base_pairs / 1e9:.2f}G"
          f"  ({time.time() - t0:.0f}s)", flush=True)

    # --- tile-reuse plan -----------------------------------------------
    t0 = time.time()
    plan = tile_plan_np(q3, pack)
    n_tiles = plan["count"].shape[0]
    qrows = plan["count"]
    # bucketed q caps (128-lane granularity, same optimizer)
    q_lanes, q_caps = bucket_lanes(qrows)
    total_exact = 0
    total_capped = 0
    pair_exact = 0
    for spec, srch in zip(dev_specs, searches):
        lens = span_host.band_span_lens(
            plan, srch, np.ones(len(srch), bool), spec)
        rows = lens.sum(axis=1)
        lanes, caps = bucket_lanes(rows)
        total_exact += int(rows.sum())
        total_capped += lanes
        pair_exact += int((qrows * rows).sum())
        print(f"  [tile-reuse] band {spec.tile_edge}: exact rows "
              f"{int(rows.sum())} capped {lanes} caps {caps}",
              flush=True)
    print(f"[tile-reuse] tiles {n_tiles}  q rows p50/p95/max "
          f"{int(np.percentile(qrows, 50))}/"
          f"{int(np.percentile(qrows, 95))}/{int(qrows.max())}  "
          f"q lanes {q_lanes} (caps {q_caps}, fill {n / q_lanes:.2f})",
          flush=True)
    print(f"[tile-reuse] cand lanes exact {total_exact} "
          f"({total_exact / base_lanes:.2f}x current) capped "
          f"{total_capped} ({total_capped / base_lanes:.2f}x)  "
          f"pair work exact {pair_exact / 1e9:.2f}G "
          f"({pair_exact / base_pairs:.2f}x)  "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
