"""Span-plan statistics for the bench workload (CPU, no TPU needed).

Prints, per (q_cap, x_seg) config and band: entry count, grid steps,
span slots per step, live-span fraction, span length stats, static
window size, and the implied per-extract scalar-floor / DMA / compute
budgets at the measured per-unit costs.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
from scripts.trace_compute import make_cloud, N_POINTS, EDGES, RADII  # noqa: E402
from nimrud_tpu.ops import device_grid, packing, unique  # noqa: E402
from nimrud_tpu.ops.pallas import gather_kernel  # noqa: E402


from nimrud_tpu.ops.span_host import span_plan  # noqa: E402


def span_plan_stats(query, q_valid, search, s_valid, spec):
    """Span-slot statistics from the shared host plan
    (nimrud_tpu.ops.span_host.span_plan -- the same code production
    uses for packed candidate-capacity sizing)."""
    lens, live_e, count = span_plan(query, q_valid, search, s_valid, spec)
    totals = lens.sum(axis=1)
    lt = totals[live_e & (totals > 0)]
    n_span = lens.shape[1]
    batch = 8                       # span_batch used by trace_compute
    n_steps = -(-spec.e_cap // batch)
    live_mask = lens > 0
    ll = lens[live_mask]
    return {
        "n_steps": n_steps,
        "slots_per_step": batch * n_span,
        "live_spans": int(live_mask.sum()),
        "len_sum": int(lens.sum()),
        "len_mean": float(ll.mean()) if ll.size else 0.0,
        "len_p50": int(np.percentile(ll, 50)) if ll.size else 0,
        "len_p95": int(np.percentile(ll, 95)) if ll.size else 0,
        "len_max": int(ll.max()) if ll.size else 0,
        "live_entries": int(live_e.sum()),
        "q_count_sum": int(count.sum()),
        "tot_mean": float(lt.mean()) if lt.size else 0.0,
        "tot_p50": int(np.percentile(lt, 50)) if lt.size else 0,
        "tot_p95": int(np.percentile(lt, 95)) if lt.size else 0,
        "tot_p99": int(np.percentile(lt, 99)) if lt.size else 0,
        "tot_max": int(lt.max()) if lt.size else 0,
        "cap_cover": {c: float((lt <= c).mean())
                      for c in (256, 384, 512, 768, 1024, 1536, 2048)},
    }


def main():
    rng = np.random.default_rng(0)
    cloud = make_cloud(N_POINTS, rng)
    lo = cloud.min(0).astype(np.float64)
    hi = cloud.max(0).astype(np.float64)
    query = jnp.asarray(cloud)

    configs = [(256, 32), (512, 8), (512, 32), (1024, 64)]
    if len(sys.argv) > 1:
        configs = [tuple(int(x) for x in c.split("/"))
                   for c in sys.argv[1:]]

    for q_cap, x_seg in configs:
        print(f"=== q_cap={q_cap} x_seg={x_seg} m=3 ===")
        for edge, radius in zip(EDGES, RADII):
            spec = device_grid.make_spec(
                lo, hi, radius, n_query=N_POINTS, voxel_edge=edge,
                q_cap=q_cap, m=3, x_seg=x_seg)
            spec = device_grid.with_entry_estimate(spec, cloud)
            vox_spec = packing.GridSpec.fit_bounds(lo, hi, edge)
            centers, _, mask = unique.unique_voxels(query, vox_spec)
            n_search = int(mask.sum())

            plan = span_plan_stats(
                query, jnp.ones(N_POINTS, bool), centers, mask, spec)
            window = gather_kernel.span_window(spec.span_rows)
            chunks = window // 128
            live = plan["live_spans"]
            steps = plan["n_steps"]
            total = plan["slots_per_step"] * steps
            print(f"  band r={radius}: e_cap={spec.e_cap} "
                  f"steps={steps} slots/step={plan['slots_per_step']} "
                  f"spans: live={live}/{total} "
                  f"({100.0 * live / total:.0f}%) "
                  f"len mean={plan['len_mean']:.0f} "
                  f"p50={plan['len_p50']} p95={plan['len_p95']} "
                  f"max={plan['len_max']} "
                  f"span_rows={spec.span_rows} window={window} "
                  f"({chunks} chunks) s_cap={spec.s_cap} "
                  f"n_search={n_search}")
            floor_us = 1.4 * live
            dma_mb = live * window * 16 / 1e6
            live_lanes = plan["len_sum"]
            print(f"    -> floor~{floor_us / 1e3:.0f}ms "
                  f"dma={dma_mb:.0f}MB "
                  f"live_lanes={live_lanes / 1e6:.1f}M "
                  f"window_lanes={live * window / 1e6:.1f}M "
                  f"(fill {100.0 * live_lanes / (live * window):.1f}%)")
            cov = " ".join(f"{c}:{100.0 * f:.1f}%"
                           for c, f in plan["cap_cover"].items())
            print(f"    entry candidate totals: mean={plan['tot_mean']:.0f} "
                  f"p50={plan['tot_p50']} p95={plan['tot_p95']} "
                  f"p99={plan['tot_p99']} max={plan['tot_max']}")
            print(f"    c_cap coverage: {cov}")


if __name__ == "__main__":
    main()
