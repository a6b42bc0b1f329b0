"""
RPTE dense-walk probe: where do 10.4 s/step go?

bench_rpte.py measured the flagship RPT-ensemble serving step at
10,449 ms vs the linear headline's 54.7 ms -- the forest walk is ~99.5%
of the step.  The walk is already the dense direct-index variant (no
searchsorted), so this probes the walk IN ISOLATION on synthetic tables
of the production shape (T=10 trees, depth 14 -> 65536-slot tables,
W=12 features, B=1M points) to attribute the cost and try structural
variants:

  current   -- rpt._ensemble_proba as shipped (vmap over trees; per
               level a flat dsplits[tag] gather + a dvecs[tag] row
               gather per tree)
  fold      -- splits folded into the vecs table as an extra column:
               ONE row gather per (tree, level) instead of row + flat
  flat      -- the tree axis flattened into the gather index (one
               (T*B,)-index gather per level, no vmap) in case the
               vmapped gather lowers badly
  foldflat  -- both
  shallow   -- current at max_depth=7 (cost-vs-levels linearity check)

Timing is the device-trace window around K=2 calls.  One variant per
PROCESS (the trace drain's d2h degrades this relay's process).

Usage: python scripts/probe_rpte_walk.py {current|fold|flat|foldflat|shallow}
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

B = 1_000_000
T = 10
W = 12
DEPTH = 14
SIZE = 1 << (DEPTH + 2)
C = 3
RUNS = 2

T0 = time.perf_counter()


def note(msg):
    print(f"[probe_walk +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def synth_tables(rng):
    """Random tables in the production format.  Content does not matter
    for cost (the level loop is shape-static), but splits carry real
    +-inf leaves so the walk's where-lanes see realistic data."""
    splits = rng.normal(0, 1, (T, SIZE)).astype(np.float32)
    # mark ~half the deep nodes leaves
    leaf = rng.random((T, SIZE)) < 0.5
    splits = np.where(leaf, np.float32(np.inf), splits)
    vecs = rng.normal(0, 1, (T, SIZE, W)).astype(np.float32)
    ginis = rng.random((T, SIZE)).astype(np.float32)
    props = rng.random((T, SIZE, C)).astype(np.float32)
    return splits, vecs, ginis, props


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "current"

    import jax
    import jax.numpy as jnp

    from nimrud_tpu.learning import rpt
    from nimrud_tpu.utils.profiling import device_track_stats

    rng = np.random.default_rng(5)
    splits, vecs, ginis, props = synth_tables(rng)
    data_h = rng.normal(0, 1, (B, W)).astype(np.float32)

    depth = 7 if variant == "shallow" else DEPTH

    if variant in ("current", "shallow"):
        tables = {
            "dense_splits": jnp.asarray(splits),
            "dense_vecs": jnp.asarray(vecs),
            "dense_ginis": jnp.asarray(ginis),
            "dense_props": jnp.asarray(props),
        }

        def run(data):
            return rpt._ensemble_proba(tables, data, depth, "wmean")

    elif variant == "fold":
        # splits ride the vecs rows as column W: one gather per level
        folded = np.concatenate([vecs, splits[:, :, None]], axis=2)
        fold_t = jnp.asarray(folded)
        gin_t, prop_t = jnp.asarray(ginis), jnp.asarray(props)

        @jax.jit
        def run(data):
            def walk(fv, gn, pr):
                tag = jnp.ones(B, jnp.int32)
                done = jnp.zeros(B, bool)
                node = jnp.zeros(B, jnp.int32)

                def level(_, carry):
                    tag, done, node = carry
                    row = fv[tag]                      # (B, W+1)
                    split = row[:, W]
                    is_leaf = jnp.isinf(split)
                    node = jnp.where((~done) & is_leaf, tag, node)
                    done = done | is_leaf
                    proj = jnp.sum(data * row[:, :W], axis=1)
                    nxt = (tag << 1) | (proj > split).astype(jnp.int32)
                    tag = jnp.where(done, tag, nxt)
                    return tag, done, node

                _, _, node = jax.lax.fori_loop(
                    0, depth + 1, level, (tag, done, node))
                return gn[node], pr[node]

            gini, proportions = jax.vmap(walk)(fold_t, gin_t, prop_t)
            weights = (1.0 - gini).T[:, :, None]
            proportions = jnp.transpose(proportions, (1, 0, 2))
            weights = weights / (jnp.sum(weights, 1, keepdims=True)
                                 + jnp.float32(np.spacing(32)))
            return jnp.sum(proportions * weights, axis=1)

    elif variant in ("flat", "foldflat"):
        # tree axis folded into the index: one big gather per level
        fold = variant == "foldflat"
        if fold:
            tabf = np.concatenate(
                [vecs, splits[:, :, None]], axis=2).reshape(T * SIZE,
                                                            W + 1)
            tab_t = jnp.asarray(tabf)
        else:
            vec_t = jnp.asarray(vecs.reshape(T * SIZE, W))
            spl_t = jnp.asarray(splits.reshape(T * SIZE))
        gin_t = jnp.asarray(ginis.reshape(T * SIZE))
        prop_t = jnp.asarray(props.reshape(T * SIZE, C))
        offs = jnp.asarray((np.arange(T) * SIZE)[:, None]
                           .astype(np.int32))     # (T, 1)

        @jax.jit
        def run(data):
            tag = jnp.ones((T, B), jnp.int32)
            done = jnp.zeros((T, B), bool)
            node = jnp.zeros((T, B), jnp.int32)

            def level(_, carry):
                tag, done, node = carry
                idx = (offs + tag).reshape(T * B)
                if fold:
                    row = tab_t[idx].reshape(T, B, W + 1)
                    split = row[:, :, W]
                    vrow = row[:, :, :W]
                else:
                    split = spl_t[idx].reshape(T, B)
                    vrow = vec_t[idx].reshape(T, B, W)
                is_leaf = jnp.isinf(split)
                node = jnp.where((~done) & is_leaf, tag, node)
                done = done | is_leaf
                proj = jnp.sum(data[None] * vrow, axis=2)
                nxt = (tag << 1) | (proj > split).astype(jnp.int32)
                tag = jnp.where(done, tag, nxt)
                return tag, done, node

            _, _, node = jax.lax.fori_loop(
                0, depth + 1, level, (tag, done, node))
            nidx = (offs + node).reshape(T * B)
            gini = gin_t[nidx].reshape(T, B)
            proportions = prop_t[nidx].reshape(T, B, C)
            weights = (1.0 - gini).T[:, :, None]
            proportions = jnp.transpose(proportions, (1, 0, 2))
            weights = weights / (jnp.sum(weights, 1, keepdims=True)
                                 + jnp.float32(np.spacing(32)))
            return jnp.sum(proportions * weights, axis=1)

    else:
        raise SystemExit(f"unknown variant {variant!r}")

    data = jnp.asarray(data_h)
    out = run(data)
    jax.block_until_ready(out)
    note(f"compiled ({variant})")

    trace_dir = tempfile.mkdtemp(prefix="nimrud_probe_walk_")
    with jax.profiler.trace(trace_dir):
        for _ in range(RUNS):
            out = run(data)
        jax.block_until_ready(out)
        float(out[0, 0])                       # force real completion
    busy_us, window_us = device_track_stats(trace_dir)
    shutil.rmtree(trace_dir, ignore_errors=True)

    print(json.dumps({
        "probe": "rpte_walk",
        "variant": variant,
        "B": B, "T": T, "W": W, "depth": depth, "table_slots": SIZE,
        "window_ms_per_call": round(window_us / 1e3 / RUNS, 2),
        "busy_ms_per_call": round(busy_us / 1e3 / RUNS, 2),
        "device": str(jax.devices()[0]),
    }))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
