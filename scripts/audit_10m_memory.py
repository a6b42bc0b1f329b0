"""
Host-side HBM audit of the packed multi-band serving program at the
10M-point workload (BASELINE config 3).  No device needed: mirrors the
spec sizing that pipeline._fused_band_specs does and prices every
MATERIALIZED buffer under the TPU (8,128) f32 tiling rule -- an
f32[N, k] array costs N * max(k, 128-padded) lanes, i.e. (N, 3) pays a
42x lane pad.  This is what OOMed bench10m runs 3/4 (23 GB demand vs
17.2 GB HBM on v5e).

Prints a table of the big buffers for the CURRENT design and for the
planned fixes, so kernel-interface decisions are made on numbers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def tiled_bytes(shape, dtype_bytes=4, min_lane=128, min_sub=8):
    """Padded HBM bytes of a materialized array under (8,128) tiling."""
    if len(shape) == 1:
        shape = (1,) + tuple(shape)
    *lead, sub, lane = shape
    pad_sub = -(-sub // min_sub) * min_sub
    pad_lane = -(-lane // min_lane) * min_lane
    n = dtype_bytes * pad_sub * pad_lane
    for d in lead:
        n *= d
    return n


def fmt(n):
    return f"{n / 2**30:7.2f} GB"


def main():
    from nimrud_tpu.utils.workload import (
        make_bench_cloud, BENCH_EDGES, BENCH_RADII)
    from nimrud_tpu.features import multiscale
    from nimrud_tpu.ops import device_grid, span_host

    n = int(os.environ.get("AUDIT_N", 10_000_000))
    t0 = time.time()
    cloud, _ = make_bench_cloud(n=n, seed=1)
    cloud = np.asarray(cloud, np.float32)[:, :3]
    print(f"cloud built ({time.time()-t0:.0f}s), n={n}")

    lo = cloud.min(0) - 1e-3
    hi = cloud.max(0) + 1e-3
    q_bucket = multiscale._pow2_bucket(n)
    print("q_bucket", q_bucket)

    scaleset = [(edge, (radius,))
                for edge, radius in zip(BENCH_EDGES, BENCH_RADII)]
    dev_specs = [device_grid.make_spec(
        lo, hi, max(radii), n_query=q_bucket, voxel_edge=edge,
        q_cap=512, x_seg=32) for edge, radii in scaleset]
    pack_spec = min(dev_specs, key=lambda s: s.tile_edge)

    total_now = 0
    total_fix = 0

    def row(name, now, fix):
        nonlocal total_now, total_fix
        total_now += now
        total_fix += fix
        print(f"  {name:46s} now {fmt(now)}   fixed {fmt(fix)}")

    # ---- query side (shared) -------------------------------------------
    print("\nshared query side:")
    row("query u16 (bucket,3)", tiled_bytes((q_bucket, 3), 2),
        tiled_bytes((q_bucket, 3), 2))
    # sort in+out: 5 columns (ids, iota, x, y, z)
    row("q sort cols in+out (10x (N,))",
        10 * tiled_bytes((q_bucket,)), 10 * tiled_bytes((q_bucket,)))

    e_need = device_grid.estimate_entries(cloud, pack_spec)
    e_trim = e_need + max(e_need // 8, 512)
    e_trim = -(-e_trim // 256) * 256
    e_worst = pack_spec.e_cap
    print(f"  pack e_cap worst={e_worst} est={e_need} trimmed={e_trim}")
    q_cap = pack_spec.q_cap

    # q_pts kernel input: now (E, q_cap, 3) -> 42x pad; fixed (3, E*q_cap)
    row(f"q_pts  E={e_worst}->(trim {e_trim}) x q{q_cap}",
        tiled_bytes((e_worst, q_cap, 3)),
        tiled_bytes((3, e_trim * q_cap)))
    # q_sorted gather operand (N, 3) if XLA materializes it
    row("q_sorted gather operand (N,3) (if unfused)",
        tiled_bytes((q_bucket, 3)), 0)

    width_total = 4 * sum(len(r) for _, r in scaleset)
    # classifier input flat (E*q_cap, width): now materialized; fixed
    # chunked (transient <= chunk)
    row(f"clf input flat ({e_worst}*{q_cap}, {width_total})",
        tiled_bytes((e_worst * q_cap, width_total)),
        tiled_bytes((2048 * q_cap, width_total)))
    row("labels+pos int32 (2x (N,))",
        2 * tiled_bytes((q_bucket,)), 2 * tiled_bytes((q_bucket,)))

    # ---- per band -------------------------------------------------------
    for (edge, radii), spec in zip(scaleset, dev_specs):
        print(f"\nband edge={edge} radii={radii} "
              f"tile={spec.tile_edge} dims={spec.dims}:")
        t1 = time.time()
        centers = multiscale._host_unique_voxels(cloud, edge)
        n_vox = len(centers)
        v_cap = n_vox + n_vox // 4 + 4096
        v_cap = -(-v_cap // 16384) * 16384
        print(f"  n_vox={n_vox} v_cap={v_cap} "
              f"({time.time()-t1:.0f}s host unique)")
        t1 = time.time()
        c_cap = span_host.candidate_cap(cloud, centers, spec,
                                        pack_spec=pack_spec)
        print(f"  c_cap={c_cap} ({time.time()-t1:.0f}s host span plan)")

        s_rows_now = q_bucket          # no v_cap at stage today
        s_rows_fix = v_cap
        # sorted search ops: voxel centers (s_rows, 3) sort cols + the
        # sorted_pts gather operand (N,3)
        row("  search sort cols in+out (8x (S,))",
            8 * tiled_bytes((s_rows_now,)), 8 * tiled_bytes((s_rows_fix,)))
        row("  sorted_pts gather operand (S,3)",
            tiled_bytes((s_rows_now, 3)), tiled_bytes((3, s_rows_fix)))
        row("  unique_voxels sort/compact (~6x (N,))",
            6 * tiled_bytes((q_bucket,)), 6 * tiled_bytes((q_bucket,)))
        # span tables (E, n_span): n_span = (m+2)^2 grid of rows.  m=3
        n_span = 25
        row(f"  span starts+lens (E,{n_span}) int32 x2",
            2 * tiled_bytes((e_worst, n_span)),
            2 * tiled_bytes((e_trim, n_span)))
        # src3 select-chain output (E, c_cap) int32
        row(f"  src3 (E,{c_cap}) int32",
            tiled_bytes((e_worst, c_cap)),
            tiled_bytes((2048, c_cap)))
        # candidate gather transient (chunked to 4M lanes both ways)
        row("  cand gather+kernel in (3, <=4M lanes)",
            tiled_bytes((3, 4 * 2**20)), tiled_bytes((3, 4 * 2**20)))
        # kernel output slabs (E, width=16*n_r, q_cap)
        w = 16 * len(radii)
        row(f"  slabs (E,{w},{q_cap})",
            tiled_bytes((e_worst, w, q_cap)),
            tiled_bytes((2048, w, q_cap)))

    print(f"\nTOTAL (coarse, live-at-once upper-ish bound): "
          f"now {fmt(total_now)}  fixed {fmt(total_fix)}")
    print("HBM v5e: 16.0 GB (17.2e9 B usable reported by allocator)")


if __name__ == "__main__":
    main()
