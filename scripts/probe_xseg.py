"""
Host-mirror sweep of the pack-spec segment width ``x_seg``.

Entry fill (69% at x_seg=32 on the 1M bench) is set by partial rank
blocks at segment ends: each occupied (x_seg-tile, y, z) segment ends
with one partial q_cap block.  Wider segments mean fewer partials --
fewer entries, fewer q_t gather lanes, smaller rank sorts -- while the
candidate reach per entry is bounded by the entry's ACTUAL sorted-query
x-extent (device_grid._pack_plan uses first/last query tiles, not the
segment), so candidate lanes should barely move.  This sweep measures
both sides on the span_host mirror of the production serving plan (the
same code that sizes the shipped caps), with NO device involvement.

Run: PYTHONPATH=/root/repo python scripts/probe_xseg.py
"""

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from nimrud_tpu.ops import device_grid, span_host
from nimrud_tpu.features import multiscale
from nimrud_tpu.pipeline import _serving_entry_chunk
from nimrud_tpu.utils.workload import (
    BENCH_EDGES, BENCH_RADII, make_bench_cloud)


def lanes_of_caps(totals, c_cap, entry_chunk):
    """Total packing-gather lanes the bucketed band_blocks path runs for
    measured per-entry candidate ``totals`` under caps ``c_cap`` (int or
    (caps, bounds)), mirroring device_grid.band_blocks."""
    e_cap = totals.shape[0]
    chunk = e_cap if entry_chunk is None else int(entry_chunk)
    if not isinstance(c_cap, tuple):
        return e_cap * int(c_cap)
    caps, bounds = c_cap
    lanes = 0
    for s in range(0, e_cap, chunk):
        n = min(chunk, e_cap - s)
        edges = (0,) + tuple(min(b, n) for b in bounds) + (n,)
        for cap, a, b in zip(caps, edges[:-1], edges[1:]):
            lanes += (b - a) * cap
    return lanes


def main():
    cloud, _ = make_bench_cloud()
    q3 = cloud[:, :3]
    lo = q3.min(0).astype(np.float64)
    hi = q3.max(0).astype(np.float64)
    scaleset = [(e, (r,)) for e, r in zip(BENCH_EDGES, BENCH_RADII)]
    q_bucket = multiscale._pow2_bucket(len(cloud))
    host_centers = [multiscale._host_unique_voxels(q3, e)
                    for e, _ in scaleset]

    for x_seg in (32, 64, 128, 512):
        dev_specs = [device_grid.make_spec(
            lo, hi, max(radii), n_query=q_bucket, voxel_edge=edge,
            q_cap=512, m=3, x_seg=x_seg) for edge, radii in scaleset]
        dev_specs = [device_grid.with_entry_estimate(s, q3)
                     for s in dev_specs]
        pack_spec = min(dev_specs, key=lambda s: s.tile_edge)
        plan = span_host.pack_plan_np(
            q3, np.ones(len(q3), bool), pack_spec)
        covered = int(plan["count"].sum())
        n_live = int(plan["live_e"].sum())
        entry_chunk = _serving_entry_chunk(
            pack_spec.e_cap, pack_spec.q_cap, None)
        q_lanes = pack_spec.e_cap * pack_spec.q_cap
        fill = covered / max(n_live * pack_spec.q_cap, 1)
        print(f"x_seg={x_seg:4d}: e_cap={pack_spec.e_cap} "
              f"live={n_live} fill={fill:.3f} q_lanes={q_lanes} "
              f"chunk={entry_chunk}")
        total_lanes = 0
        for (edge, _), spec, centers in zip(
                scaleset, dev_specs, host_centers):
            lens = span_host.band_span_lens(
                plan, centers, np.ones(len(centers), bool), spec)
            totals = lens.sum(axis=1)
            c_cap = span_host.candidate_caps_split(
                None, centers, spec, plan=plan,
                entry_chunk=entry_chunk)
            lanes = lanes_of_caps(totals, c_cap, entry_chunk)
            total_lanes += lanes
            print(f"  band edge={edge}: sum_totals={int(totals.sum())} "
                  f"max={int(totals.max())} caps={c_cap} "
                  f"lanes={lanes}")
        print(f"  TOTAL candidate lanes={total_lanes}  "
              f"(q lanes {q_lanes}, kernel pair proxy "
              f"{total_lanes * 1.0:.3g})")


if __name__ == "__main__":
    main()
