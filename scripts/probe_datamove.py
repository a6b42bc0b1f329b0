"""
Microbenchmark TPU data-movement primitives via the device trace, to
pick the fastest building blocks for the serving prep path:

  row_gather      out = a[idx]               a: (N, 3) f32
  flat_gather_x3  out = (x[idx], y[idx], z[idx])   three (N,) gathers
  lane_gather_t   out = at[:, idx]           at: (3, N) f32, lane dim
  sort_iota       sort_key_val(keys, iota)   the current pattern
  sort_payload    lax.sort((keys, x, y, z))  coords carried by the sort
  scatter_add     zeros(G).at[ids].add(1)    the counts pattern
  row_scatter     zeros(N+1, 4).at[idx].set(v)

All cases run inside ONE trace (the trace drain's d2h flips the relay
process into its degraded mode, so per-case traces would corrupt every
case after the first); per-case time comes from the "XLA Modules"
track, where each jitted case appears under its own module name.

Usage: python scripts/probe_datamove.py [n]
"""

import collections
import json
import shutil
import sys
import tempfile

import numpy as np

from nimrud_tpu.utils.profiling import _device_events


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    grid = 1_400_000
    reps = 3
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    idx = rng.permutation(n).astype(np.int32)
    keys = rng.integers(0, grid, n).astype(np.int32)
    vals = rng.random((n, 4)).astype(np.float32)

    a = jnp.asarray(pts)
    at = jnp.asarray(pts.T.copy())
    x, y, z = (jnp.asarray(pts[:, i].copy()) for i in range(3))
    i32 = jnp.asarray(idx)
    k32 = jnp.asarray(keys)
    v32 = jnp.asarray(vals)
    iota = jnp.arange(n, dtype=jnp.int32)

    # args passed explicitly -- closed-over arrays would be baked in as
    # constants and the whole case constant-folded at compile time
    def row_gather(a, i32):
        return a[i32]

    def flat_gather_x3(x, y, z, i32):
        return x[i32], y[i32], z[i32]

    def lane_gather_t(at, i32):
        return at[:, i32]

    def sort_iota(k32, iota):
        return jax.lax.sort_key_val(k32, iota)

    def sort_payload(k32, x, y, z):
        return jax.lax.sort((k32, x, y, z), num_keys=1)

    def sort_payload5(k32, iota, x, y, z):
        return jax.lax.sort((k32, iota, x, y, z), num_keys=1)

    def scatter_add(k32):
        return jnp.zeros(grid + 1, jnp.int32).at[k32].add(1)

    def row_scatter(i32, v32):
        return jnp.zeros((n + 1, 4), jnp.float32).at[i32].set(v32)

    def monotonic_gather(v32, iota):
        return v32[jnp.minimum(iota + (iota // 7), n - 1)]

    cases = [
        (row_gather, (a, i32)),
        (flat_gather_x3, (x, y, z, i32)),
        (lane_gather_t, (at, i32)),
        (sort_iota, (k32, iota)),
        (sort_payload, (k32, x, y, z)),
        (sort_payload5, (k32, iota, x, y, z)),
        (scatter_add, (k32,)),
        (row_scatter, (i32, v32)),
        (monotonic_gather, (v32, iota)),
    ]
    jitted = [(fn.__name__, jax.jit(fn), args) for fn, args in cases]

    outs = []
    for _, fn, args in jitted:
        outs.append(fn(*args))                 # compile
    jax.block_until_ready(outs)

    trace_dir = tempfile.mkdtemp(prefix="dm_probe_")
    with jax.profiler.trace(trace_dir):
        outs = []
        for _ in range(reps):
            for _, fn, args in jitted:
                outs.append(fn(*args))
        jax.block_until_ready(outs)
        leaf = jax.tree_util.tree_leaves(outs[-1])[0]
        float(jnp.asarray(leaf).reshape(-1)[0])

    # module-track durations are enqueue stubs for small programs; the
    # honest signal is the XLA Ops track.  Assign each op event to the
    # most recent module START and sum.
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
    for ts, name in starts:
        count[name] += 1

    results = {}
    for name, us in per_module.items():
        label = name.split("(")[0].replace("jit_", "")
        results[label] = round(us / 1e3 / max(count[name], 1), 3)

    print(json.dumps({"n": n, "ms_per_call": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
