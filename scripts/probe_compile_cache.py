"""Probe: does the JAX persistent compilation cache work over the axon
relay's remote compile service?

Runs a moderately-sized jitted program (sort + gather + matmul mix,
shapes unusual enough not to collide with bench programs) and reports
the trace+compile wall.  Run TWICE (separate processes, same cache
dir): if the second run's compile wall collapses (~seconds instead of
~minutes), the cache round-trips through the relay and every bench
stage can warm-start.

Usage: python scripts/probe_compile_cache.py [cache_dir]
"""
import os
import sys
import time

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.jax_cache"

import jax
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np


def step(x, idx, w):
    order = jnp.argsort(x[:, 0])
    xs = x[order]
    g = xs[idx]
    m = jnp.einsum("nk,kj->nj", g, w,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(m, axis=0), order[:8]


def main():
    n = 777_216          # deliberately odd bucket: no collision with bench
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, 3), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(131_072,), dtype=np.int32))
    w = jnp.asarray(rng.standard_normal((3, 128), dtype=np.float32))

    fn = jax.jit(step)
    t0 = time.time()
    lowered = fn.lower(x, idx, w)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print({"device": jax.devices()[0].device_kind,
           "lower_sec": round(t1 - t0, 2),
           "compile_sec": round(t2 - t1, 2),
           "cache_dir": cache_dir,
           "cache_files": len(os.listdir(cache_dir))
           if os.path.isdir(cache_dir) else 0},
          flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
