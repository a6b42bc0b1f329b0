"""
Microbenchmark sliced XLA gathers against the per-slot row gathers the
packed serving path uses today.  Both hot gathers move CONTIGUOUS data:

  q_t    each entry reads ranks [start_e, start_e + q_cap) of the
         sorted query array (device_grid._pack_plan builds the slot
         indices as start + iota, then row-gathers 1.6M rows);
  cand   each packed span is a contiguous x-row range of the band's
         tile-sorted search array, packed back-to-back into c_cap lanes.

If TPU gather cost is per-INDEX (the datamove probe measured (N, 3) row
gathers at the same per-index rate as (N,) flat gathers, i.e. slice
width is ~free), replacing per-slot indices with per-entry (q_cap, 3)
slices and per-8/16-lane-group (G, 3) slices should cut the two ops by
the slice width.  Cases at the 1M bench shapes:

  qt_slot      (E*512,) row indices into (n, 3)       [current]
  qt_slice     (E,) starts, slice (512, 3) from (n, 3)
  qt_slice_t   (E,) starts, slice (3, 512) from (3, n) lane-dim slices
  cand_slot    (M,) row indices into (ns, 3)          [current]
  cand_slice8  (M/8,) starts, slice (8, 3)
  cand_slice16 (M/16,) starts, slice (16, 3)
  cand_slice32 (M/32,) starts, slice (32, 3)

Usage: python scripts/probe_slice_gather.py
"""

import collections
import json
import shutil
import tempfile

import numpy as np

from nimrud_tpu.utils.profiling import _device_events


def main():
    import jax
    import jax.numpy as jnp
    from jax.lax import GatherDimensionNumbers, GatherScatterMode, gather

    n = 1_000_000          # queries
    q_cap = 512
    e_cap = 3_072          # entries (bench e_cap ballpark)
    ns = 300_000           # one band's search voxel centers
    m = 768_000            # one band's packed candidate lanes
    reps = 3
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.random((n + q_cap, 3)).astype(np.float32))
    qt = jnp.asarray(np.asarray(q).T.copy())
    e_starts = jnp.asarray(
        rng.integers(0, n - q_cap, e_cap).astype(np.int32))
    s = jnp.asarray(rng.random((ns + 32, 3)).astype(np.float32))
    cand_idx = jnp.asarray(rng.integers(0, ns, m).astype(np.int32))
    # grouped starts: contiguous groups land anywhere in the operand
    g_starts = {w: jnp.asarray(
        rng.integers(0, ns, m // w).astype(np.int32)) for w in (8, 16, 32)}

    def qt_slot(q, e_starts):
        idx = jnp.clip(
            e_starts[:, None] + jnp.arange(q_cap, dtype=jnp.int32),
            0, n - 1)
        flat = q[idx.reshape(-1)].T
        return jnp.swapaxes(flat.reshape(3, e_cap, q_cap), 0, 1)

    dn_rows = GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0,))

    def qt_slice(q, e_starts):
        out = gather(q, e_starts[:, None], dn_rows, (q_cap, 3),
                     mode=GatherScatterMode.CLIP)
        return jnp.swapaxes(out, 1, 2)

    dn_lane = GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(1,))

    def qt_slice_t(qt, e_starts):
        return gather(qt, e_starts[:, None], dn_lane, (3, q_cap),
                      mode=GatherScatterMode.CLIP)

    def cand_slot(s, cand_idx):
        return s[cand_idx].T

    def make_cand_slice(w):
        def cand_slice(s, starts):
            out = gather(s, starts[:, None], dn_rows, (w, 3),
                         mode=GatherScatterMode.CLIP)
            return out.reshape(-1, 3).T
        cand_slice.__name__ = f"cand_slice{w}"
        return cand_slice

    cases = [
        (qt_slot, (q, e_starts)),
        (qt_slice, (q, e_starts)),
        (qt_slice_t, (qt, e_starts)),
        (cand_slot, (s, cand_idx)),
    ]
    for w in (8, 16, 32):
        cases.append((make_cand_slice(w), (s, g_starts[w])))
    jitted = [(fn.__name__, jax.jit(fn), args) for fn, args in cases]

    outs = [fn(*args) for _, fn, args in jitted]     # compile
    jax.block_until_ready(outs)

    trace_dir = tempfile.mkdtemp(prefix="sg_probe_")
    with jax.profiler.trace(trace_dir):
        outs = []
        for _ in range(reps):
            for _, fn, args in jitted:
                outs.append(fn(*args))
        jax.block_until_ready(outs)
        float(jnp.asarray(outs[-1]).reshape(-1)[0])

    starts = []
    ops = []
    for thread, name, ts, dur in _device_events(trace_dir):
        low = thread.lower()
        if "module" in low:
            starts.append((ts, name))
        elif "step" not in low:
            ops.append((ts, dur))
    shutil.rmtree(trace_dir, ignore_errors=True)
    starts.sort()
    ops.sort()
    per_module = collections.Counter()
    count = collections.Counter()
    pos = 0
    for ts, dur in ops:
        while pos + 1 < len(starts) and starts[pos + 1][0] <= ts:
            pos += 1
        if starts:
            per_module[starts[pos][1]] += dur
    for _, name in starts:
        count[name] += 1

    results = {}
    for name, us in per_module.items():
        label = name.split("(")[0].replace("jit_", "")
        results[label] = round(us / 1e3 / max(count[name], 1), 3)
    print(json.dumps({"n": n, "e_cap": e_cap, "m": m,
                      "ms_per_call": results}, indent=1))


if __name__ == "__main__":
    main()
