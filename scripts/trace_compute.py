"""
Honest device-compute timing via a profiler trace.

On the relay-attached TPU, ``jax.block_until_ready`` returns without
awaiting dispatched device work, so wall-clock timing measures dispatch,
not compute (ROADMAP "Timing semantics").  The device trace sidesteps
that: the TPU's own tracer records per-op start/duration on the device
timeline, so summing the "XLA Ops" track gives true device busy time
regardless of what the host thinks.

Runs the benchmark workload's fused extraction per backend under
``jax.profiler.trace`` and reports, per variant:
  device_busy_ms:  sum of XLA-op durations on the device track
  window_ms:       last op end - first op start (includes gaps)
points/sec derived from device_busy_ms.

Usage:  python scripts/trace_compute.py [n_repeats] [variant]

Run ONE VARIANT PER PROCESS on the relay: the forced d2h that drains
the trace flips the process into the degraded mode where large fused
programs run ~30x slower (CLAUDE.md), which would corrupt any variant
traced after the first.
"""

import json
import os
import shutil
import sys
import tempfile

import numpy as np


N_POINTS = int(os.environ.get("TC_N", 1_048_576))  # override for smokes
EDGES = (0.25, 0.5, 1.0)
RADII = (0.5, 1.0, 2.0)


from nimrud_tpu.utils.profiling import device_track_stats  # noqa: E402


def make_cloud(n, rng):
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = [rng.random((n // 16, 3)) * [0.2, 12, 9]
             + [rng.random() * 90, rng.random() * 90, 0] for _ in range(8)]
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    return np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]


def main():
    import jax
    import jax.numpy as jnp
    from nimrud_tpu.ops import device_grid, packing, unique

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rng = np.random.default_rng(0)
    cloud = make_cloud(N_POINTS, rng)
    lo = cloud.min(0).astype(np.float64)
    hi = cloud.max(0).astype(np.float64)

    query = jnp.asarray(cloud)
    q_valid = jnp.ones(N_POINTS, bool)

    def make_bands(q_cap, m=3, x_seg=1):
        bands = []
        for edge, radius in zip(EDGES, RADII):
            vox_spec = packing.GridSpec.fit_bounds(lo, hi, edge)
            centers, _, mask = unique.unique_voxels(query, vox_spec)
            spec = device_grid.make_spec(
                lo, hi, radius, n_query=N_POINTS, voxel_edge=edge,
                q_cap=q_cap, m=m, x_seg=x_seg)
            spec = device_grid.with_entry_estimate(spec, cloud)
            bands.append((centers, mask, spec, (radius,)))
        jax.block_until_ready([b[0] for b in bands])
        return bands

    bands_cache = {}

    def bands_for(q_cap, m=3, x_seg=1):
        if (q_cap, m, x_seg) not in bands_cache:
            bands_cache[(q_cap, m, x_seg)] = make_bands(q_cap, m, x_seg)
        return bands_cache[(q_cap, m, x_seg)]

    def run_xla(precision, q_cap=64):
        return [device_grid.fused_extract(
            query, q_valid, centers, mask, spec, radii, "minimal",
            None, precision, N_POINTS)
            for centers, mask, spec, radii in bands_for(q_cap)]

    def run_spans(batch, q_cap=64, precision="highest", m=3, x_seg=1,
                  debug=None):
        return [device_grid.fused_extract_spans(
            query, q_valid, centers, mask, spec, radii, "minimal",
            None, N_POINTS, span_batch=batch, precision=precision,
            debug=debug)
            for centers, mask, spec, radii in bands_for(q_cap, m, x_seg)]

    def host_caps(q_cap, m=3, x_seg=1, margin=1.25):
        # c_cap from HOST-side stats on the CPU backend (a device
        # packed_cap readback would trip the relay's first-d2h
        # degradation pre-trace)
        from scripts.span_stats import span_plan_stats
        cpu = jax.local_devices(backend="cpu")[0]
        caps = []
        for (edge, radius), (_, _, spec, _) in zip(
                zip(EDGES, RADII), bands_for(q_cap, m, x_seg)):
            with jax.default_device(cpu):
                vox_spec = packing.GridSpec.fit_bounds(lo, hi, edge)
                c, _, mk = unique.unique_voxels(
                    jnp.asarray(cloud), vox_spec)
                stats = span_plan_stats(
                    cloud, np.ones(N_POINTS, bool),
                    np.asarray(c), np.asarray(mk), spec)
            caps.append(max(
                -(-int(stats["tot_max"] * margin) // 128) * 128, 128))
        return caps

    def run_packed(batch, q_cap=64, precision="highest", m=3, x_seg=1):
        caps = host_caps(q_cap, m, x_seg)
        return [device_grid.fused_extract_packed(
            query, q_valid, centers, mask, spec, radii, "minimal",
            None, N_POINTS, cap, entry_batch=batch,
            precision=precision)
            for cap, (centers, mask, spec, radii)
            in zip(caps, bands_for(q_cap, m, x_seg))]

    variants = {
        "xla_highest": lambda: run_xla("highest"),
        "xla_mixed": lambda: run_xla("mixed"),
        "xla_highest_q128": lambda: run_xla("highest", 128),
        "xla_highest_q256": lambda: run_xla("highest", 256),
        "xla_mixed_q256": lambda: run_xla("mixed", 256),
        "pallas_spans_b1": lambda: run_spans(1),
        "pallas_spans_b8": lambda: run_spans(8),
        "pallas_spans_b8_q128": lambda: run_spans(8, 128),
        "pallas_spans_b16_q128": lambda: run_spans(16, 128),
        "pallas_spans_b8_q256": lambda: run_spans(8, 256),
        "pallas_spans_b8_q128_bf16x2": lambda: run_spans(8, 128, "bf16x2"),
        "pallas_spans_b32_q256": lambda: run_spans(32, 256),
        "pallas_spans_b8_q256_m4": lambda: run_spans(8, 256, "highest", 4),
        "pallas_spans_b8_q256_m2": lambda: run_spans(8, 256, "highest", 2),
        "spans_q256_xs32": lambda: run_spans(8, 256, "highest", 3, 32),
        "spans_q1024_xs64": lambda: run_spans(8, 1024, "highest", 3, 64),
        "spans_q1024_xs64_r16": lambda: run_spans(8, 1024, "highest", 3, 64),
        "spans_q256_xs64": lambda: run_spans(8, 256, "highest", 3, 64),
        "spans_q1024_xs32": lambda: run_spans(8, 1024, "highest", 3, 32),
        "spans_q512_xs32": lambda: run_spans(8, 512, "highest", 3, 32),
        "spans_q512_xs16": lambda: run_spans(8, 512, "highest", 3, 16),
        "spans_q256_xs16": lambda: run_spans(8, 256, "highest", 3, 16),
        "spans_q128_xs16": lambda: run_spans(8, 128, "highest", 3, 16),
        "spans_q256_xs32_bf16x2": lambda: run_spans(8, 256, "bf16x2", 3, 32),
        "spans_q1024_xs16": lambda: run_spans(8, 1024, "highest", 3, 16),
        "spans_q512_xs8": lambda: run_spans(8, 512, "highest", 3, 8),
        "spans_q1024_xs8": lambda: run_spans(8, 1024, "highest", 3, 8),
        "dbg_nodma": lambda: run_spans(8, 256, "highest", 3, 32, "nodma"),
        "dbg_nocompute": lambda: run_spans(8, 256, "highest", 3, 32, "nocompute"),
        "dbg_noboth": lambda: run_spans(8, 256, "highest", 3, 32, "noboth"),
        "packed_q256_xs32": lambda: run_packed(8, 256, "highest", 3, 32),
        "packed_q512_xs32": lambda: run_packed(8, 512, "highest", 3, 32),
        "packed_q1024_xs64": lambda: run_packed(8, 1024, "highest", 3, 64),
        "packed_q256_xs32_b16": lambda: run_packed(16, 256, "highest", 3, 32),
        "packed_q512_xs32_bf16x2": lambda: run_packed(8, 512, "bf16x2", 3, 32),
    }
    if len(sys.argv) > 2:
        pick = sys.argv[2]
        variants = {pick: variants[pick]}

    results = {}
    for name, fn in variants.items():
        try:
            jax.block_until_ready(fn())          # compile outside trace
            trace_dir = tempfile.mkdtemp(prefix=f"nimrud_trace_{name}_")
            with jax.profiler.trace(trace_dir):
                outs = None
                for _ in range(repeats):
                    outs = fn()
                jax.block_until_ready(outs)
                # force real completion: tiny d2h of one scalar
                float(outs[0][0, 0])
            busy_us, window_us = device_track_stats(trace_dir)
            per_extract_ms = busy_us / 1e3 / repeats
            results[name] = {
                "device_busy_ms_per_extract": round(per_extract_ms, 3),
                "window_ms_total": round(window_us / 1e3, 3),
                "point_scales_per_sec_M": round(
                    N_POINTS * len(RADII) / (per_extract_ms / 1e3) / 1e6,
                    1),
            }
            shutil.rmtree(trace_dir, ignore_errors=True)
        except Exception as error:
            results[name] = {"error": str(error)[:300]}

    print(json.dumps({
        "repeats": repeats,
        "n_points": N_POINTS,
        "scales": list(RADII),
        "variants": results,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
