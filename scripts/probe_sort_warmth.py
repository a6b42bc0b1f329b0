"""
Is a TPU sort cheaper on already-sorted input?  (Round-4 VERDICT item 2
premised "reuse the previous cloud's sort order as a warm start" on
near-sorted sorts being cheap.  XLA lowers lax.sort to a fixed
comparison network, so the cost should be DATA-INDEPENDENT -- this
probe records the measurement that justifies rejecting the warm-start
design and building designated-search staging instead.)

Prints one JSON line with the device-trace window of each variant.
"""

import json
import shutil
import tempfile

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 1_000_000
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2 ** 30, n).astype(np.int32)
    pay = rng.random((3, n)).astype(np.float32)

    @jax.jit
    def run(k, a, b, c):
        out = jax.lax.sort((k, a, b, c), num_keys=1)
        return tuple(o[::4096].sum() for o in out)   # keep it live

    k_rand = jnp.asarray(keys)
    k_sorted = jnp.asarray(np.sort(keys))
    # near-sorted: sorted keys with 1% random swaps (the jittering-
    # cloud warm-start scenario)
    near = np.sort(keys)
    idx = rng.integers(0, n, n // 100)
    near[idx] = rng.integers(0, 2 ** 30, n // 100).astype(np.int32)
    k_near = jnp.asarray(near)
    pays = tuple(jnp.asarray(p) for p in pay)

    jax.block_until_ready(run(k_rand, *pays))        # compile

    from nimrud_tpu.utils.profiling import device_track_stats
    out = {}
    reps = 4
    for name, k in (("random", k_rand), ("sorted", k_sorted),
                    ("near_sorted", k_near)):
        trace_dir = tempfile.mkdtemp(prefix="nimrud_sortprobe_")
        with jax.profiler.trace(trace_dir):
            r = None
            for _ in range(reps):
                r = run(k, *pays)
            jax.block_until_ready(r)
            float(r[0][0] if hasattr(r[0], "__len__") else r[0])
        busy, window = device_track_stats(trace_dir)
        shutil.rmtree(trace_dir, ignore_errors=True)
        out[name + "_ms_per_sort"] = round(window / 1e3 / reps, 3)
    out["n"] = n
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
