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
  k3c       -- k3 chunked over 65536-point blocks (sequential lax.map),
               the PRODUCTION configuration (rpt._BLK_POINT_CHUNK) --
               the baseline the hybrid must beat.
  hybc      -- k3c with the first three BLOCKS (levels 0-8) fetched
               without any gather: level 0's subtree row is a
               broadcast (every pair sits at the root), and blocks at
               levels 3 / 6 fetch their (2^d)-row level tables by
               ONE-HOT MATMUL on the MXU (oh (T,B,2^d) @ (T,2^d,91))
               instead of an 11.4M-row gather.  Exact under HIGHEST
               precision -- each output lane is 1.0*x + zeros, and the
               bf16x3 f32 decomposition reconstructs x exactly -- BUT
               0 * inf = NaN, so the shallow tables carry 2^100 as the
               leaf sentinel instead of +inf (power of two: exact in
               every decomposition; real splits are data-scale).
               Gather blocks (levels 9+) keep the inf tables.

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

    elif variant in ("k3c", "hybc"):
        K, R = 3, 7
        PADW = R * (W + 1)
        CHUNK = 65536 if not SMALL else 1024
        SENT = np.float32(2.0 ** 100)
        base = np.concatenate(
            [vecs, splits[:, :, None]], axis=2).reshape(T * SIZE, W + 1)
        flat_idx = np.arange(T * SIZE)
        tree, tagv = flat_idx // SIZE, flat_idx % SIZE
        cols = []
        for d in range(K):
            for j in range(1 << d):
                child = (tagv << d) + j
                src = np.where(child < SIZE, tree * SIZE + np.minimum(
                    child, SIZE - 1), 0)
                cols.append(base[src])
        tab_h = np.concatenate(cols, axis=1)        # (T*SIZE, 91)
        tab_t = jnp.asarray(tab_h)
        gin_t = jnp.asarray(ginis.reshape(T * SIZE))
        prop_t = jnp.asarray(props.reshape(T * SIZE, C))
        offs = jnp.asarray((np.arange(T) * SIZE)[:, None]
                           .astype(np.int32))
        # shallow level tables for the matmul blocks: rows for codes
        # [2^d, 2^(d+1)), split lanes sentinel-ized (0 * inf = NaN in
        # the one-hot matmul)
        tab3 = tab_h.reshape(T, SIZE, PADW)
        split_lanes = np.arange(R) * (W + 1) + W
        shallow = {}
        for d in (0, 3, 6):
            if d > DEPTH:
                break
            sub = tab3[:, (1 << d):(1 << (d + 1))].copy()
            lanes = sub[:, :, split_lanes]
            sub[:, :, split_lanes] = np.where(
                np.isinf(lanes), SENT, lanes)
            shallow[d] = jnp.asarray(sub)           # (T, 2^d, 91)
        leaf_at = np.float32(2.0 ** 99)
        n_mm_blocks = len(shallow)

        def block_levels(lvl0, row, tag, done, node, data_c, shallow_blk):
            """Apply the 3 in-block levels given the fetched 91-lane
            subtree rows (identical math for gather and matmul blocks;
            only the leaf test differs)."""
            sub = row[:, :, :W + 1]
            bits = jnp.zeros(tag.shape, jnp.int32)
            for d in range(K):
                active = lvl0 + d <= depth
                split = sub[:, :, W]
                is_leaf = (split >= leaf_at) if shallow_blk \
                    else jnp.isinf(split)
                node = jnp.where(active & (~done) & is_leaf, tag, node)
                done = jnp.where(active, done | is_leaf, done)
                proj = jnp.sum(data_c[None] * sub[:, :, :W], axis=2)
                bit = (proj > split).astype(jnp.int32)
                tag = jnp.where(active & ~done, (tag << 1) | bit, tag)
                if d + 1 < K:
                    bits = (bits << 1) | bit
                    start = (1 << (d + 1)) - 1
                    sel = [row[:, :, (start + j) * (W + 1):
                               (start + j + 1) * (W + 1)]
                           for j in range(1 << (d + 1))]
                    for b in range(d + 1):
                        bb = ((bits >> b) & 1)[:, :, None] == 1
                        sel = [jnp.where(bb, hi, lo)
                               for lo, hi in zip(sel[0::2], sel[1::2])]
                    sub = sel[0]
            return tag, done, node

        hybrid = variant == "hybc"

        @jax.jit
        def run(data):
            n = data.shape[0]
            pad = -n % CHUNK
            padded = jnp.concatenate(
                [data, jnp.zeros((pad, W), data.dtype)]) if pad else data

            def chunk_walk(data_c):
                bc = data_c.shape[0]
                tag = jnp.ones((T, bc), jnp.int32)
                done = jnp.zeros((T, bc), bool)
                node = jnp.zeros((T, bc), jnp.int32)
                lvl0 = jnp.int32(0)
                if hybrid:
                    for d in sorted(shallow):
                        if d == 0:
                            # every pair is at the root: broadcast
                            row = jnp.broadcast_to(
                                shallow[0][:, 0][:, None, :],
                                (T, bc, PADW))
                        else:
                            loc = tag - (1 << d)
                            oh = (loc[:, :, None] == jnp.arange(
                                1 << d, dtype=jnp.int32)).astype(
                                    jnp.float32)
                            row = jnp.einsum(
                                "tbn,tnw->tbw", oh, shallow[d],
                                precision=jax.lax.Precision.HIGHEST)
                        tag, done, node = block_levels(
                            jnp.int32(d), row, tag, done, node,
                            data_c, True)
                    lvl0 = jnp.int32(3 * n_mm_blocks)

                def cond(carry):
                    lvl, _, done, _ = carry
                    return (lvl <= depth) & ~jnp.all(done)

                def gblock(carry):
                    lvl, tag, done, node = carry
                    row = tab_t[(offs + tag).reshape(-1)].reshape(
                        T, bc, PADW)
                    tag, done, node = block_levels(
                        lvl, row, tag, done, node, data_c, False)
                    return lvl + K, tag, done, node

                _, _, _, node = jax.lax.while_loop(
                    cond, gblock, (lvl0, tag, done, node))
                nidx = (offs + node).reshape(-1)
                return gin_t[nidx].reshape(T, bc), \
                    prop_t[nidx].reshape(T, bc, C)

            gini, proportions = jax.lax.map(
                chunk_walk, padded.reshape(-1, CHUNK, W))
            gini = jnp.moveaxis(gini, 0, 1).reshape(T, -1)[:, :n]
            proportions = jnp.moveaxis(proportions, 0, 1).reshape(
                T, pad + n, C)[:, :n]
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

    # one end-of-process digest download (~12 MB) so structural
    # variants can be compared BIT-identical across device runs
    digest = None
    try:
        import hashlib
        arr = np.asarray(out)
        digest = hashlib.sha1(arr.tobytes()).hexdigest()
    except Exception as error:           # pragma: no cover
        digest = f"d2h failed: {str(error)[:80]}"

    print(json.dumps({
        "probe": "rpte_walk",
        "variant": variant,
        "digest": digest,
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
