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
  k2 / k3   -- foldflat with 2 / 3 LEVELS PER GATHER: each table row
               holds the node's whole 2^k-1-node subtree slice
               ((2^k-1)*(W+1) lanes, still <= one 128-lane vreg row at
               k=3/W=12), child selection within a block is an
               elementwise where-chain, so the per-index gather cost
               amortizes over k levels.  Wins iff gather cost is per-
               INDEX, not per-byte, at these widths.
  wide91    -- foldflat with rows padded to the k3 width (91) but still
               ONE level per gather: isolates the width slope of the
               gather so k2/k3 results are attributable.

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

# NIMRUD_PROBE_SMALL=1: tiny CPU run printing an output digest, so the
# structural variants (k2/k3/wide91) can be checked bit-identical to
# foldflat before paying a device compile
SMALL = bool(os.environ.get("NIMRUD_PROBE_SMALL"))
B = 8192 if SMALL else 1_000_000
T = 10
W = 12
DEPTH = 6 if SMALL else 14
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
    if SMALL:
        jax.config.update("jax_platforms", "cpu")
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

    elif variant in ("k2", "k3", "k4", "wide91"):
        K = {"k2": 2, "k3": 3, "k4": 4, "wide91": 1}[variant]
        R = (1 << K) - 1                     # subtree rows per block
        PADW = 91 if variant == "wide91" else R * (W + 1)
        base = np.concatenate(
            [vecs, splits[:, :, None]], axis=2).reshape(T * SIZE, W + 1)
        flat_idx = np.arange(T * SIZE)
        tree, tagv = flat_idx // SIZE, flat_idx % SIZE
        cols = []
        for d in range(K):
            for j in range(1 << d):
                child = (tagv << d) + j
                ok = child < SIZE
                src = np.where(ok, tree * SIZE + np.minimum(
                    child, SIZE - 1), 0)
                # out-of-tree rows are only reachable past the depth
                # cap, where every update is masked; content irrelevant
                cols.append(base[src])
        tab = np.concatenate(cols, axis=1)
        if tab.shape[1] < PADW:
            tab = np.pad(tab, ((0, 0), (0, PADW - tab.shape[1])))
        tab_t = jnp.asarray(tab)
        gin_t = jnp.asarray(ginis.reshape(T * SIZE))
        prop_t = jnp.asarray(props.reshape(T * SIZE, C))
        offs = jnp.asarray((np.arange(T) * SIZE)[:, None]
                           .astype(np.int32))

        @jax.jit
        def run_t(data, tab):
            tag = jnp.ones((T, B), jnp.int32)
            done = jnp.zeros((T, B), bool)
            node = jnp.zeros((T, B), jnp.int32)

            def cond(carry):
                lvl, _, done, _ = carry
                return (lvl <= depth) & ~jnp.all(done)

            def block(carry):
                lvl, tag, done, node = carry
                row = tab[(offs + tag).reshape(T * B)].reshape(
                    T, B, PADW)
                sub = row[:, :, :W + 1]
                bits = jnp.zeros((T, B), jnp.int32)
                for d in range(K):
                    active = lvl + d <= depth
                    split = sub[:, :, W]
                    is_leaf = jnp.isinf(split)
                    node = jnp.where(active & (~done) & is_leaf,
                                     tag, node)
                    done = jnp.where(active, done | is_leaf, done)
                    proj = jnp.sum(data[None] * sub[:, :, :W], axis=2)
                    bit = (proj > split).astype(jnp.int32)
                    nxt = (tag << 1) | bit
                    tag = jnp.where(active & ~done, nxt, tag)
                    if d + 1 < K:
                        # where-chain child select among level d+1's
                        # 2^(d+1) block rows (elementwise, no gather);
                        # local index = in-block path bits, so adjacent
                        # option pairs differ in the LSB: select LSB
                        # upward.  Done pairs select garbage rows whose
                        # updates are all masked above.
                        bits = (bits << 1) | bit
                        start = (1 << (d + 1)) - 1
                        sel = [row[:, :, (start + j) * (W + 1):
                                   (start + j + 1) * (W + 1)]
                               for j in range(1 << (d + 1))]
                        for b in range(d + 1):
                            bb = ((bits >> b) & 1)[:, :, None] == 1
                            sel = [jnp.where(bb, hi, lo)
                                   for lo, hi in zip(sel[0::2],
                                                     sel[1::2])]
                        sub = sel[0]
                return lvl + K, tag, done, node

            _, _, _, node = jax.lax.while_loop(
                cond, block, (jnp.int32(0), tag, done, node))
            nidx = (offs + node).reshape(T * B)
            gini = gin_t[nidx].reshape(T, B)
            proportions = prop_t[nidx].reshape(T, B, C)
            weights = (1.0 - gini).T[:, :, None]
            proportions = jnp.transpose(proportions, (1, 0, 2))
            weights = weights / (jnp.sum(weights, 1, keepdims=True)
                                 + jnp.float32(np.spacing(32)))
            return jnp.sum(proportions * weights, axis=1)

        def run(data):
            return run_t(data, tab_t)

    else:
        raise SystemExit(f"unknown variant {variant!r}")

    data = jnp.asarray(data_h)
    out = run(data)
    jax.block_until_ready(out)
    note(f"compiled ({variant})")

    if SMALL:
        import hashlib
        arr = np.asarray(out)
        print(json.dumps({
            "probe": "rpte_walk_small", "variant": variant,
            "B": B, "depth": depth,
            "digest": hashlib.sha1(arr.tobytes()).hexdigest(),
            "sum": float(np.float64(arr).sum()),
        }))
        sys.stdout.flush()
        os._exit(0)

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
