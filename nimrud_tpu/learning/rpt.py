"""
Random-projection-tree ensemble classifier with batched XLA inference.

Capability parity with the reference's from-scratch ensemble
(reference: nimrud/prototypes/ml.py:11-429; method from Dasgupta & Freund
2008): each tree trains on a disjoint class-balanced subset; cells split on
a random unit projection at a jittered median until gini impurity or
population thresholds; test points walk down, dead (training-empty) leaves
back off to their parent branch; per-tree (gini, class proportions) combine
by impurity-weighted mean ('wmean') or weighted max ('wmax').

TPU-first redesign: fitting is a tiny host-side recursion (training
subsets are small by construction), but the fitted forest is *flattened
into arrays* -- per tree a sorted branch-code table with split value,
projection vector, gini and proportions per node -- and ``predict_proba``
runs as one jitted level-synchronous walk: every test point advances one
level per step via a searchsorted lookup + gathered projection, all trees
and all points in parallel.  No Python recursion at inference time.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# branch codes carry one bit per level plus the root bit; int32 tables
# require depth < 31.  The reference had no cap (Python recursion only);
# depth 30 is unreachable for real data with min_obs >= 2.
MAX_DEPTH = 30

_LEAF = np.float32(np.inf)


class RPTEnsemble:
    """
    sklearn-style API: ``fit``, ``predict``, ``predict_proba``,
    ``predict_and_proba``, ``set_params``.

    Parameters (matching the reference's kwargs):
      d_func:       'wmean' (impurity-weighted mean of proportions) or
                    'wmax' (max of weighted proportions).
      n_estimators: trees in the ensemble.
      impurity:     gini threshold to stop splitting; a float, or a
                    (lo, hi) tuple to randomize per tree.
      min_obs:      minimum training samples in a branch.
      onepass:      test observations evaluated per device batch.
      seed:         RNG seed for reproducible fits.
    """

    def __init__(self, d_func="wmean", n_estimators=10, impurity=0.2,
                 min_obs=20, onepass=10000, seed=None,
                 prune_chains=True):
        self.d_func = d_func
        self.n_estimators = n_estimators
        self.impurity = impurity
        self.min_obs = min_obs
        self.onepass = onepass
        self.seed = seed
        self.prune_chains = prune_chains
        self._tables = None

    def set_params(self, **kwargs):
        for key in ("d_func", "n_estimators", "impurity", "min_obs",
                    "onepass", "seed"):
            if key in kwargs:
                setattr(self, key, kwargs[key])
        return self

    # -- fitting (host) -----------------------------------------------------

    def fit(self, data, labels):
        data = np.asarray(data, dtype=np.float64)
        labels = np.asarray(labels).astype(np.int64)
        assert labels.size == data.shape[0], \
            "training set and label set do not match!"
        self.numlabs = int(labels.max() + 1)
        self.dim = data.shape[1]
        rng = np.random.RandomState(self.seed)

        # class-balanced disjoint subsets: shuffle each class's indices,
        # split the smallest class's population across the trees
        index = np.arange(data.shape[0])
        per_class = [index[labels == c] for c in range(self.numlabs)]
        for rows in per_class:
            rng.shuffle(rows)
        min_pop = min(rows.size for rows in per_class)
        per_tree = min_pop // self.n_estimators
        if per_tree < 1:
            raise ValueError(
                f"smallest class has {min_pop} samples; cannot build "
                f"{self.n_estimators} balanced trees")
        perm = rng.permutation(min_pop)

        trees = []
        for n in range(self.n_estimators):
            chosen = perm[n * per_tree:(n + 1) * per_tree]
            rows = np.concatenate([rows.take(chosen) for rows in per_class])
            if isinstance(self.impurity, tuple):
                impurity = max(self.impurity) \
                    - rng.rand() * min(self.impurity)
            else:
                impurity = self.impurity
            rules = {}
            self._grow(data.take(rows, axis=0), labels.take(rows),
                       tag=1, impurity=impurity, rng=rng, rules=rules,
                       depth=0)
            if self.prune_chains:
                _prune_terminal_chains(rules, self.dim)
            trees.append(rules)
        self.trees_ = trees
        self._tables = self._flatten(trees)
        return self

    def _grow(self, data, labels, tag, impurity, rng, rules, depth):
        """Recursively grow one tree into a {branch_code: node} dict."""
        num = data.shape[0]
        proportions = np.array(
            [(labels == c).sum() for c in range(self.numlabs)],
            dtype=np.float64) / num
        gini = 1.0 - (proportions ** 2).sum()

        if gini <= impurity or num <= self.min_obs or depth >= MAX_DEPTH:
            rules[tag] = (_LEAF, np.zeros(self.dim), gini, proportions)
            return

        vec = rng.rand(self.dim)
        vec /= np.linalg.norm(vec)
        projection = data @ vec
        split = np.median(projection)
        # jitter the median by the cell diameter (Dasgupta-Freund rule)
        anchor = data[rng.randint(num)]
        diameter = np.linalg.norm(data - anchor, axis=1).max()
        split += (rng.rand() - 0.5) * 12 * diameter / np.sqrt(self.dim)

        rules[tag] = (split, vec, gini, proportions)
        left = projection <= split
        if left.any():
            self._grow(data[left], labels[left], tag << 1,
                       impurity, rng, rules, depth + 1)
        right = ~left
        if right.any():
            self._grow(data[right], labels[right], (tag << 1) | 1,
                       impurity, rng, rules, depth + 1)

    def _flatten(self, trees):
        """Pack the rule dicts into padded per-tree device tables.

        When the forest is shallow enough (code space <= 2**16 nodes),
        an additional DENSE packing indexes nodes directly by branch
        code -- the device walk then needs no searchsorted and no
        parent-backoff lookup per level (dead leaves are resolved at
        pack time by copying the parent's statistics into the missing
        cell).  ROADMAP round-1 item 5.
        """
        n_nodes = max(len(rules) for rules in trees)
        n_trees = len(trees)
        tags = np.full((n_trees, n_nodes), np.iinfo(np.int32).max,
                       dtype=np.int32)
        splits = np.full((n_trees, n_nodes), np.inf, dtype=np.float32)
        vecs = np.zeros((n_trees, n_nodes, self.dim), dtype=np.float32)
        ginis = np.zeros((n_trees, n_nodes), dtype=np.float32)
        props = np.zeros((n_trees, n_nodes, self.numlabs), dtype=np.float32)
        depth = 0
        for t, rules in enumerate(trees):
            for i, code in enumerate(sorted(rules)):
                split, vec, gini, prop = rules[code]
                tags[t, i] = code
                splits[t, i] = split
                vecs[t, i] = vec
                ginis[t, i] = gini
                props[t, i] = prop
                depth = max(depth, int(code).bit_length() - 1)
        self.max_depth_ = depth
        out = {
            "tags": jnp.asarray(tags),
            "splits": jnp.asarray(splits),
            "vecs": jnp.asarray(vecs),
            "ginis": jnp.asarray(ginis),
            "props": jnp.asarray(props),
        }

        size = 1 << (depth + 2)
        if size <= (1 << 16):
            dsplits = np.full((n_trees, size), np.inf, np.float32)
            dvecs = np.zeros((n_trees, size, self.dim), np.float32)
            dginis = np.zeros((n_trees, size), np.float32)
            dprops = np.zeros((n_trees, size, self.numlabs), np.float32)
            for t, rules in enumerate(trees):
                for code, (split, vec, gini, prop) in rules.items():
                    dsplits[t, code] = split
                    dvecs[t, code] = vec
                    dginis[t, code] = gini
                    dprops[t, code] = prop
                present = np.zeros(size, bool)
                present[list(rules)] = True
                for lvl in range(1, depth + 2):
                    codes = np.arange(1 << lvl, min(1 << (lvl + 1), size))
                    miss = codes[~present[codes]]
                    # dead branch: inherit the parent's statistics as a
                    # leaf (reference ml.py:369-380 backoff semantics)
                    dginis[t, miss] = dginis[t, miss >> 1]
                    dprops[t, miss] = dprops[t, miss >> 1]
            out.update({
                "dense_splits": jnp.asarray(dsplits),
                "dense_vecs": jnp.asarray(dvecs),
                "dense_ginis": jnp.asarray(dginis),
                "dense_props": jnp.asarray(dprops),
            })
        return add_blocked_tables(out)

    # -- fitting (device) -----------------------------------------------------

    def fit_device(self, features, labels, n_classes=None, depth=14):
        """
        Fit the whole forest ON DEVICE: projections, per-node medians
        (sorted-segment lookup), Dasgupta-Freund jitter, gini stopping
        and the dense node tables all run inside one jitted program --
        features never cross back to the host.  ``labels`` should be a
        HOST array (class-balanced subset selection is index bookkeeping;
        fit()'s labels are host-resident anyway), so the only transfer
        is the usual parameter-free upload path.

        Semantics match :meth:`fit` (reference ml.py:110-180 grow rules)
        with two documented deviations: the split-jitter anchor is the
        cell's first sample in sorted order instead of a uniformly
        random one (both satisfy the Dasgupta-Freund "random point of
        the cell" role), and depth caps at ``depth`` (<= 15, the dense
        direct-index table budget) instead of 30.  RNG is jax.random,
        so a device fit is reproducible against itself, not against the
        host fit.
        """
        labels = np.asarray(labels).astype(np.int64)
        features = jnp.asarray(features, dtype=jnp.float32)
        self.numlabs = int(labels.max() + 1) if n_classes is None \
            else int(n_classes)
        self.dim = int(features.shape[1])
        depth = int(min(depth, 15))
        rng = np.random.RandomState(self.seed)

        row_sets, imps = self._plan_subsets(labels, rng)
        rows = jnp.asarray(row_sets.astype(np.int32))
        imps = jnp.asarray(imps)
        key = jax.random.PRNGKey(
            rng.randint(0, 2 ** 31 - 1) if self.seed is None
            else self.seed)

        tables = _fit_forest_device(
            features, jnp.asarray(labels.astype(np.int32)), rows, imps,
            key, self.numlabs, depth, float(self.min_obs))
        self.max_depth_ = depth
        self._tables = add_blocked_tables(tables)
        self.trees_ = None              # host rule dicts not built
        return self

    def _plan_subsets(self, labels_flat, rng):
        """Class-balanced disjoint per-tree row sets (host bookkeeping,
        shared verbatim by fit_device and fit_device_mesh so both pick
        the SAME rows given the same seed)."""
        index = np.arange(labels_flat.shape[0])
        per_class = [index[labels_flat == c]
                     for c in range(self.numlabs)]
        for rows in per_class:
            rng.shuffle(rows)
        min_pop = min(rows.size for rows in per_class)
        per_tree = min_pop // self.n_estimators
        if per_tree < 1:
            raise ValueError(
                f"smallest class has {min_pop} samples; cannot build "
                f"{self.n_estimators} balanced trees")
        perm = rng.permutation(min_pop)
        row_sets, imps = [], []
        for n in range(self.n_estimators):
            chosen = perm[n * per_tree:(n + 1) * per_tree]
            row_sets.append(np.concatenate(
                [rows.take(chosen) for rows in per_class]))
            if isinstance(self.impurity, tuple):
                imps.append(max(self.impurity)
                            - rng.rand() * min(self.impurity))
            else:
                imps.append(float(self.impurity))
        return np.stack(row_sets), np.asarray(imps, np.float32)

    def fit_device_mesh(self, feats, valid, labels, mesh, axis=None,
                        n_classes=None, depth=14):
        """
        Fit the forest ACROSS a device mesh: per-device feature shards
        never leave their devices whole -- each tree's class-balanced
        subset is assembled by disjoint scatter + ``psum`` (exact: every
        subset row is contributed by exactly one shard, zeros
        elsewhere), each device grows its slice of the forest with the
        same per-tree keys the single-device fit uses, and the dense
        node tables gather back along the tree axis.  BIT-IDENTICAL to
        :meth:`fit_device` on the device-major flattening of the valid
        rows, given the same seed (same subset plan, same
        :func:`_grow_tree_device` arithmetic per tree).

        Args:
          feats:  (n_devices, rows, dim) float32 per-device features
                  (e.g. from parallel.mesh.sharded_extract).
          valid:  (n_devices, rows) bool HOST array.
          labels: (n_devices, rows) int HOST array (class-balanced
                  subset selection is host index bookkeeping, exactly
                  like fit_device's labels).
          mesh:   a 1-axis jax Mesh over the sharded dimension.

        Reference: nimrud/prototypes/ml.py:110 (RPT_ensemble.fit); the
        reference trains single-GPU only -- this realizes the "train
        where it serves" story for the flagship classifier.
        """
        from jax import shard_map
        from jax.sharding import PartitionSpec
        import math

        axis = mesh.axis_names[0] if axis is None else axis
        n_dev = int(math.prod(mesh.devices.shape))
        valid = np.asarray(valid, bool)
        labels_h = np.asarray(labels).astype(np.int64)
        labels_flat = labels_h[valid]
        self.numlabs = int(labels_flat.max() + 1) if n_classes is None \
            else int(n_classes)
        self.dim = int(feats.shape[-1])
        depth = int(min(depth, 15))
        rng = np.random.RandomState(self.seed)

        row_sets, imps = self._plan_subsets(labels_flat, rng)
        n_trees, s_t = row_sets.shape
        key = jax.random.PRNGKey(
            rng.randint(0, 2 ** 31 - 1) if self.seed is None
            else self.seed)
        keys = jax.random.split(key, n_trees)

        # flat valid index -> (device, row); np.nonzero is device-major,
        # matching labels[valid]'s flattening
        dev_idx, row_idx = np.nonzero(valid)
        sel = row_sets.reshape(-1)                    # (T * S_t,)
        sel_dev = dev_idx[sel].astype(np.int32)
        sel_row = row_idx[sel].astype(np.int32)
        labs_sub = labels_flat[sel].astype(np.int32)

        # pad the forest to a multiple of the device count (pad trees
        # recompute tree 0 and are dropped)
        t_per = -(-n_trees // n_dev)
        pad = t_per * n_dev - n_trees
        if pad:
            imps = np.concatenate([imps, np.repeat(imps[:1], pad)])
            keys = jnp.concatenate([keys, jnp.repeat(keys[:1], pad, 0)])
        imps_d = jnp.asarray(imps).reshape(n_dev, t_per)
        keys_d = keys.reshape(n_dev, t_per, -1)
        labs_d = jnp.asarray(labs_sub).reshape(n_trees, s_t)

        sel_dev_j = jnp.asarray(sel_dev)
        sel_row_j = jnp.asarray(sel_row)
        rows_cap = int(feats.shape[1])
        numlabs, min_obs = self.numlabs, float(self.min_obs)

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(PartitionSpec(axis), PartitionSpec(axis),
                      PartitionSpec(axis)),
            out_specs=(PartitionSpec(axis),) * 4,
            check_vma=False)
        def run(feat_d, imps_dd, keys_dd):
            f = feat_d[0]                             # (rows, dim)
            mine = sel_dev_j == jax.lax.axis_index(axis)
            contrib = jnp.where(
                mine[:, None],
                f[jnp.clip(sel_row_j, 0, rows_cap - 1)], 0.0)
            subset = jax.lax.psum(contrib, axis)      # (T*S_t, dim)
            blocks = subset.reshape(n_trees, s_t, -1)
            base = jax.lax.axis_index(axis) * t_per
            my_blocks = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate(                      # tree padding
                    [blocks, jnp.repeat(blocks[:1], pad, 0)])
                if pad else blocks, base, t_per)
            my_labs = jax.lax.dynamic_slice_in_dim(
                jnp.concatenate(
                    [labs_d, jnp.repeat(labs_d[:1], pad, 0)])
                if pad else labs_d, base, t_per)
            out = jax.vmap(
                lambda d, lb, imp, k: _grow_tree_device(
                    d, lb, imp, k, numlabs, depth, min_obs))(
                my_blocks, my_labs, imps_dd[0], keys_dd[0])
            return tuple(o[None] for o in out)

        dsplits, dvecs, dginis, dprops = run(
            jnp.asarray(feats, jnp.float32), imps_d, keys_d)
        self.max_depth_ = depth
        self._tables = add_blocked_tables({
            "dense_splits": dsplits.reshape(
                (-1,) + dsplits.shape[2:])[:n_trees],
            "dense_vecs": dvecs.reshape(
                (-1,) + dvecs.shape[2:])[:n_trees],
            "dense_ginis": dginis.reshape(
                (-1,) + dginis.shape[2:])[:n_trees],
            "dense_props": dprops.reshape(
                (-1,) + dprops.shape[2:])[:n_trees],
        })
        self.trees_ = None
        return self

    # -- inference (device) ---------------------------------------------------

    def predict_proba(self, data):
        data = np.asarray(data, dtype=np.float32)
        assert data.shape[1] == self.dim, \
            "test data do not match training data dimensions!"
        out = []
        for start in range(0, data.shape[0], self.onepass):
            chunk = jnp.asarray(data[start:start + self.onepass])
            out.append(np.asarray(_ensemble_proba(
                self._tables, chunk, self.max_depth_, self.d_func)))
        return np.concatenate(out, axis=0)

    def proba_device(self, features):
        """Class probabilities for a device-resident feature array."""
        return _ensemble_proba(
            self._tables, features, self.max_depth_, self.d_func)

    def predict(self, data):
        return self.predict_proba(data).argmax(axis=1)

    def predict_and_proba(self, data):
        proba = self.predict_proba(data)
        return proba.argmax(axis=1), proba


def _prune_terminal_chains(rules, dim):
    """
    Collapse terminal degenerate chains, exactly.

    The Dasgupta-Freund jitter (+-6 diameter/sqrt(dim)) frequently lands
    the split outside the cell: one child is empty, the other carries
    the SAME data (identical gini/proportions), and the recursion runs
    to the depth cap.  At inference every path through such a chain
    yields the chain's statistics -- the dead-side exit backs off to the
    chain node, and the terminal leaf shares its stats -- so a
    single-child node whose child is a leaf with identical statistics
    IS that leaf.  Pruning bottom-up removes whole chains, shrinking
    both the node tables and the level count of the device walk.
    """
    for code in sorted(rules, reverse=True):
        if code not in rules:
            continue
        split, _, gini, prop = rules[code]
        if np.isinf(split):
            continue
        left, right = code << 1, (code << 1) | 1
        children = [c for c in (left, right) if c in rules]
        if len(children) != 1:
            continue
        csplit, _, cgini, cprop = rules[children[0]]
        if np.isinf(csplit) and cgini == gini \
                and np.array_equal(cprop, prop):
            del rules[children[0]]
            rules[code] = (_LEAF, np.zeros(dim), gini, prop)


def _grow_tree_device(data, labs, impurity, tree_key, numlabs, depth,
                      min_obs):
    """Grow ONE tree on device, level-synchronously: at each level every
    live sample carries its branch code, per-node class counts / medians
    / cell diameters come from one scatter + one two-key sort, and the
    dense direct-index tables are written in place.  Shared verbatim by
    the single-device forest fit (:func:`_fit_forest_device`) and the
    mesh fit (:meth:`RPTEnsemble.fit_device_mesh`) so the two are
    bit-identical per tree by construction."""
    size = 1 << (depth + 2)
    dim = data.shape[1]
    # ~the host's 30-attempt budget: retries consume iterations without
    # deepening codes, so the loop runs longer than the depth cap
    attempts = 2 * depth + 4
    # node level by branch code (host constant; exact for these ints)
    lvl_of = jnp.asarray(np.floor(np.log2(np.maximum(
        np.arange(size), 1))).astype(np.int32))
    n = data.shape[0]

    splits0 = jnp.full((size,), jnp.inf, jnp.float32)
    vecs0 = jnp.zeros((size, dim), jnp.float32)
    ginis0 = jnp.zeros((size,), jnp.float32)
    props0 = jnp.zeros((size, numlabs), jnp.float32)
    written0 = jnp.zeros((size,), bool)
    code0 = jnp.ones((n,), jnp.int32)
    done0 = jnp.zeros((n,), bool)

    def level(lvl, carry):
        code, done, splits, vecs, ginis, props, written = carry
        live = ~done
        safe = jnp.where(live, code, size)       # OOB drops
        counts = jnp.zeros((size, numlabs), jnp.float32).at[
            safe, labs].add(1.0, mode="drop")
        tot = counts.sum(axis=1)
        occ = tot > 0
        denom = jnp.maximum(tot, 1.0)
        prop_d = counts / denom[:, None]
        gini_d = 1.0 - jnp.sum(prop_d * prop_d, axis=1)
        ginis = jnp.where(occ, gini_d, ginis)
        props = jnp.where(occ[:, None], prop_d, props)
        written = written | occ

        leaf_d = occ & ((gini_d <= impurity) | (tot <= min_obs)
                        | (lvl >= attempts - 1) | (lvl_of >= depth))

        # one random unit projection per (potential) node
        kv, kj = jax.random.split(jax.random.fold_in(tree_key, lvl))
        vec_d = jax.random.uniform(kv, (size, dim), jnp.float32)
        vec_d = vec_d / jnp.linalg.norm(vec_d, axis=1, keepdims=True)
        proj = jnp.sum(data * vec_d[jnp.clip(code, 0, size - 1)],
                       axis=1)                   # (n,)

        # per-node median + first-sample anchor via one 2-key sort
        order = jnp.arange(n, dtype=jnp.int32)
        s_code, s_proj, s_row = jax.lax.sort(
            (safe, proj, order), num_keys=2)
        head = jnp.concatenate(
            [jnp.ones((1,), bool), s_code[1:] != s_code[:-1]])
        starts = jnp.zeros((size,), jnp.int32).at[
            jnp.where(head, s_code, size)].set(order, mode="drop")
        mid_lo = starts + (tot.astype(jnp.int32) - 1) // 2
        mid_hi = starts + tot.astype(jnp.int32) // 2
        s_proj_ext = jnp.concatenate(
            [s_proj, jnp.zeros((1,), s_proj.dtype)])
        median = 0.5 * (
            s_proj_ext[jnp.clip(mid_lo, 0, n - 1)]
            + s_proj_ext[jnp.clip(mid_hi, 0, n - 1)])  # (size,)

        # Dasgupta-Freund jitter: +-6 * diameter / sqrt(dim), the
        # anchor being the cell's min-projection sample (a point of
        # the cell; the host fit draws it uniformly)
        anchor_row = s_row[jnp.clip(starts, 0, n - 1)]   # (size,)
        anchor = data[jnp.clip(anchor_row[
            jnp.clip(code, 0, size - 1)], 0, n - 1)]     # (n, dim)
        dist = jnp.linalg.norm(data - anchor, axis=1)
        diam = jnp.zeros((size,), jnp.float32).at[safe].max(
            dist, mode="drop")
        u = jax.random.uniform(kj, (size,), jnp.float32)
        split_d = median + (u - 0.5) * 12.0 * diam \
            / jnp.sqrt(jnp.float32(dim))

        # RETRY-IN-PLACE: the Dasgupta-Freund jitter frequently
        # lands the split outside the cell (one child empty).  The
        # host fit recurses anyway, producing degenerate chains it
        # later prunes; here a non-separating draw simply leaves
        # the node pending, and the next level redraws a fresh
        # projection for it -- chain-pruned semantics with no code
        # space growth, so the level budget buys real splits.
        go_left = proj <= split_d[jnp.clip(code, 0, size - 1)]
        lcnt = jnp.zeros((size,), jnp.float32).at[safe].add(
            go_left.astype(jnp.float32), mode="drop")
        sep = (lcnt > 0) & (lcnt < tot)
        grow = occ & ~leaf_d & sep
        splits = jnp.where(grow, split_d, splits)
        vecs = jnp.where(grow[:, None], vec_d, vecs)

        # advance only samples whose node actually split; samples
        # whose node went leaf stop
        node_code = jnp.clip(code, 0, size - 1)
        done = done | (live & leaf_d[node_code])
        nxt = (code << 1) | (~go_left).astype(jnp.int32)
        advance = (~done) & grow[node_code]
        code = jnp.where(advance, nxt, code)
        return code, done, splits, vecs, ginis, props, written

    _, _, splits, vecs, ginis, props, written = jax.lax.fori_loop(
        0, attempts, level,
        (code0, done0, splits0, vecs0, ginis0, props0, written0))

    # dead-branch backoff: unvisited cells inherit the parent's
    # statistics as leaves (reference ml.py:369-380 semantics; same
    # fill as the host _flatten dense pack)
    for lvl in range(1, depth + 2):
        lo, hi = 1 << lvl, min(1 << (lvl + 1), size)
        miss = ~written[lo:hi]
        pg = jnp.repeat(ginis[lo >> 1:hi >> 1], 2)
        pp = jnp.repeat(props[lo >> 1:hi >> 1], 2, axis=0)
        ginis = ginis.at[lo:hi].set(
            jnp.where(miss, pg, ginis[lo:hi]))
        props = props.at[lo:hi].set(
            jnp.where(miss[:, None], pp, props[lo:hi]))
        written = written.at[lo:hi].set(True)
    return splits, vecs, ginis, props

@functools.partial(
    jax.jit, static_argnames=("numlabs", "depth"))
def _fit_forest_device(features, labels, rows, impurities, key,
                       numlabs, depth, min_obs):
    """Grow the whole forest on one device: vmap of
    :func:`_grow_tree_device` over the per-tree row sets.

    Returns the dense table dict of :meth:`RPTEnsemble._flatten`.
    """
    keys = jax.random.split(key, rows.shape[0])
    dsplits, dvecs, dginis, dprops = jax.vmap(
        lambda r, imp, k: _grow_tree_device(
            features[r], labels[r], imp, k, numlabs, depth, min_obs)
    )(rows, impurities, keys)
    return {
        "dense_splits": dsplits, "dense_vecs": dvecs,
        "dense_ginis": dginis, "dense_props": dprops,
    }


def _walk_one_tree(tags, splits, vecs, ginis, props, data, max_depth):
    """
    Level-synchronous walk of one flattened tree for a batch of points.
    Returns (gini, proportions) per point.
    """
    n_nodes = tags.shape[0]
    batch = data.shape[0]
    tag = jnp.ones(batch, dtype=jnp.int32)
    done = jnp.zeros(batch, dtype=bool)
    node = jnp.zeros(batch, dtype=jnp.int32)

    def level(_, carry):
        tag, done, node = carry
        pos = jnp.clip(jnp.searchsorted(tags, tag), 0, n_nodes - 1)
        found = tags[pos] == tag
        # dead leaf (unrepresented in training): back off to the parent
        # branch and use its statistics (reference ml.py:369-380 semantics)
        parent = jnp.clip(jnp.searchsorted(tags, tag >> 1), 0, n_nodes - 1)
        use = jnp.where(found, pos, parent)
        is_leaf = (~found) | jnp.isinf(splits[use])
        newly_done = (~done) & is_leaf
        node = jnp.where(newly_done, use, node)
        done = done | is_leaf

        projection = jnp.sum(data * vecs[use], axis=1)
        next_tag = (tag << 1) | (projection > splits[use]).astype(jnp.int32)
        tag = jnp.where(done, tag, next_tag)
        return tag, done, node

    _, _, node = jax.lax.fori_loop(
        0, max_depth + 1, level, (tag, done, node))
    return ginis[node], props[node]


def _walk_one_tree_dense(dsplits, dvecs, dginis, dprops, data, max_depth):
    """Direct-index walk (no searchsorted): node = branch code, dead
    leaves pre-resolved at pack time.  Kept as the straightforward
    per-tree formulation; production inference uses
    :func:`_walk_forest_dense` (same math, measured ~2x faster on v5e)
    and the test suite pins the two bit-identical."""
    batch = data.shape[0]
    tag = jnp.ones(batch, dtype=jnp.int32)
    done = jnp.zeros(batch, dtype=bool)
    node = jnp.zeros(batch, dtype=jnp.int32)

    def level(_, carry):
        tag, done, node = carry
        split = dsplits[tag]
        is_leaf = jnp.isinf(split)
        node = jnp.where((~done) & is_leaf, tag, node)
        done = done | is_leaf
        projection = jnp.sum(data * dvecs[tag], axis=1)
        next_tag = (tag << 1) | (projection > split).astype(jnp.int32)
        tag = jnp.where(done, tag, next_tag)
        return tag, done, node

    _, _, node = jax.lax.fori_loop(
        0, max_depth + 1, level, (tag, done, node))
    return dginis[node], dprops[node]


# blocked-walk table policy: 3 levels per gather (the node's 7-row
# subtree slice per table row).  Wins only while a row fits one
# 128-lane vector register; the table is 7x dense_vecs, so cap the
# bytes too (beyond it, fall back to the per-level walk).
_BLK_LEVELS = 3
_BLK_ROWS = (1 << _BLK_LEVELS) - 1
_BLK_MAX_LANES = 128
_BLK_MAX_BYTES = 1 << 30

# shallow blocks fetched by ONE-HOT MATMUL instead of gather: at block
# base level d there are only 2^d nodes per tree, so the (T, B, 2^d)
# one-hot against the (T, 2^d, 91) level table runs on the MXU while
# the gather walk is index-rate bound.  EXACT under HIGHEST precision
# (each output lane is 1.0*x + zeros; the bf16x3 f32 decomposition
# reconstructs x bitwise -- v5e probe k3c vs hybc digests identical,
# scripts/probe_rpte_walk.py) -- BUT 0 * inf = NaN, so these tables
# carry 2^100 as the leaf sentinel (a power of two: exact in every
# decomposition; real splits are data-scale).  d=0 is a free broadcast
# (every pair sits at the root).  Beyond d=6 the one-hot materialization
# and matmul outgrow the gather (HBM traffic ~ B * 2^d).
_MM_BLOCK_STARTS = (0, 3, 6)
_MM_SENTINEL = np.float32(2.0 ** 100)
_MM_LEAF_AT = np.float32(2.0 ** 99)


def _blocked_table(dsplits, dvecs):
    """The 3-levels-per-gather walk table: row (t, n) holds the folded
    (vec | split) rows of node n, its children 2n/2n+1 and its four
    grandchildren -- 7*(W+1) lanes -- so the walk fetches THREE levels
    of one (tree, point) pair's path with ONE gather (v5e probe:
    2358 -> 1169 ms per 1M x 10-tree x depth-14 walk;
    scripts/probe_rpte_walk.py k3).  Descendant codes past the table
    (reachable only beyond the depth cap, where every update is
    masked) clamp to row 0; their values are never consumed."""
    n_trees, size, dim = dvecs.shape
    base = jnp.concatenate(
        [dvecs, dsplits[:, :, None]], axis=2).reshape(
            n_trees * size, dim + 1)
    flat = np.arange(n_trees * size)
    tree, tag = flat // size, flat % size
    cols = []
    for d in range(_BLK_LEVELS):
        for j in range(1 << d):
            child = (tag << d) + j
            src = np.where(child < size,
                           tree * size + np.minimum(child, size - 1), 0)
            cols.append(base[jnp.asarray(src, jnp.int32)])
    return jnp.concatenate(cols, axis=1)


def add_blocked_tables(tables):
    """Attach the derived blocked-walk table (and the sentinel-ized
    shallow level slices for the one-hot matmul blocks) when the dense
    packing exists and the blocked row fits one vector register
    (W <= 17) at a sane memory cost.  Idempotent; returns the same
    dict.  All ``dense_blk*`` keys are DERIVED -- excluded from
    persistence and rebuilt on load."""
    if "dense_splits" not in tables or "dense_blk" in tables:
        return tables
    n_trees, size, dim = tables["dense_vecs"].shape
    lanes = _BLK_ROWS * (dim + 1)
    if lanes > _BLK_MAX_LANES:
        return tables
    if n_trees * size * lanes * 4 > _BLK_MAX_BYTES:
        return tables
    blk = _blocked_table(tables["dense_splits"], tables["dense_vecs"])
    tables["dense_blk"] = blk
    width = dim + 1
    split_lanes = jnp.asarray(
        np.arange(_BLK_ROWS) * width + dim, jnp.int32)
    blk3 = blk.reshape(n_trees, size, _BLK_ROWS * width)
    for d in _MM_BLOCK_STARTS:
        lo, hi = 1 << d, 1 << (d + 1)
        if hi > size:
            break
        sub = blk3[:, lo:hi]                     # (T, 2^d, 7*(W+1))
        col = sub[:, :, split_lanes]
        sub = sub.at[:, :, split_lanes].set(
            jnp.where(jnp.isinf(col), _MM_SENTINEL, col))
        tables[f"dense_blk_mm{d}"] = sub
    return tables


# the blocked walk's gather output is (T, chunk, 7*(W+1)) f32 -- at the
# full 1M-point serving batch that transient is ~3.6 GB and OOMed the
# rpte serving program on v5e (15.90G/15.75G); chunking the batch
# bounds it at ~240 MB with identical per-point arithmetic
_BLK_POINT_CHUNK = 65536


def _walk_forest_blocked(tables, data, max_depth):
    """The blocked production walk: THREE levels per gather.  Each
    fetched row carries the node's 7-row subtree slice; the two inner
    child selections are elementwise where-chains over the already-
    fetched lanes (no gather).  Updates at in-block levels past the
    depth cap are masked, so outputs stay bit-identical to the
    per-level walk (pinned by test against _walk_one_tree_dense).

    Batches beyond _BLK_POINT_CHUNK walk as a sequential lax.map over
    point chunks (pad rows walk too and are sliced away), bounding the
    gather transient."""
    batch = data.shape[0]
    if batch > _BLK_POINT_CHUNK:
        chunk = _BLK_POINT_CHUNK
        n_chunks = -(-batch // chunk)
        pad = n_chunks * chunk - batch
        padded = jnp.concatenate(
            [data, jnp.zeros((pad, data.shape[1]), data.dtype)]) \
            if pad else data
        gini, props = jax.lax.map(
            lambda d: _walk_forest_blocked(tables, d, max_depth),
            padded.reshape(n_chunks, chunk, data.shape[1]))
        # (n_chunks, T, chunk[, C]) -> (T, batch[, C])
        gini = jnp.moveaxis(gini, 0, 1).reshape(
            gini.shape[1], -1)[:, :batch]
        props = jnp.moveaxis(props, 0, 1).reshape(
            props.shape[1], n_chunks * chunk, -1)[:, :batch]
        return gini, props
    blk = tables["dense_blk"]
    n_trees, size, dim = tables["dense_vecs"].shape
    batch = data.shape[0]
    width = dim + 1
    stats = jnp.concatenate(
        [tables["dense_ginis"][:, :, None], tables["dense_props"]],
        axis=2).reshape(n_trees * size, -1)
    offs = (jnp.arange(n_trees, dtype=jnp.int32) * size)[:, None]

    tag = jnp.ones((n_trees, batch), dtype=jnp.int32)
    done = jnp.zeros((n_trees, batch), dtype=bool)
    node = jnp.zeros((n_trees, batch), dtype=jnp.int32)

    def block_levels(lvl0, row, tag, done, node, shallow):
        """The 3 in-block levels over fetched 7-row subtree slices --
        identical math for gather and matmul blocks; only the leaf
        test differs (the matmul tables carry the finite sentinel)."""
        sub = row[:, :, :width]
        bits = jnp.zeros((n_trees, batch), jnp.int32)
        for d in range(_BLK_LEVELS):
            active = lvl0 + d <= max_depth
            split = sub[:, :, dim]
            is_leaf = (split >= _MM_LEAF_AT) if shallow \
                else jnp.isinf(split)
            node = jnp.where(active & (~done) & is_leaf, tag, node)
            done = jnp.where(active, done | is_leaf, done)
            projection = jnp.sum(data[None] * sub[:, :, :dim], axis=2)
            bit = (projection > split).astype(jnp.int32)
            tag = jnp.where(active & ~done, (tag << 1) | bit, tag)
            if d + 1 < _BLK_LEVELS:
                # child select among level d+1's 2^(d+1) block rows:
                # local index = in-block path bits, adjacent option
                # pairs differ in the LSB, so select LSB upward.  Done
                # pairs select garbage rows; their updates are masked.
                bits = (bits << 1) | bit
                start = (1 << (d + 1)) - 1
                sel = [row[:, :, (start + j) * width:
                           (start + j + 1) * width]
                       for j in range(1 << (d + 1))]
                for b in range(d + 1):
                    bb = ((bits >> b) & 1)[:, :, None] == 1
                    sel = [jnp.where(bb, hi, lo)
                           for lo, hi in zip(sel[0::2], sel[1::2])]
                sub = sel[0]
        return tag, done, node

    # shallow blocks without any gather: one-hot MXU matmul row select
    # (v5e probe: 1383 -> 1018 ms per 1M x 10-tree x depth-14 walk,
    # digest-identical; scripts/probe_rpte_walk.py k3c vs hybc)
    lvl0 = 0
    for d in _MM_BLOCK_STARTS:
        mm = tables.get(f"dense_blk_mm{d}")
        if mm is None or d > max_depth:
            break
        if d == 0:
            row = jnp.broadcast_to(mm[:, 0][:, None, :],
                                   (n_trees, batch, mm.shape[2]))
        else:
            # done pairs hold a frozen tag < 2^d: all-zero one-hot,
            # zero rows, every update masked by `done` above
            loc = tag - (1 << d)
            oh = (loc[:, :, None] == jnp.arange(
                1 << d, dtype=jnp.int32)).astype(jnp.float32)
            row = jnp.einsum("tbn,tnw->tbw", oh, mm,
                             precision=jax.lax.Precision.HIGHEST)
        tag, done, node = block_levels(d, row, tag, done, node, True)
        lvl0 = d + _BLK_LEVELS

    def cond(carry):
        lvl, _, done, _ = carry
        return (lvl <= max_depth) & ~jnp.all(done)

    def block(carry):
        lvl, tag, done, node = carry
        row = blk[(offs + tag).reshape(-1)].reshape(
            n_trees, batch, blk.shape[1])
        tag, done, node = block_levels(lvl, row, tag, done, node, False)
        return lvl + _BLK_LEVELS, tag, done, node

    _, _, _, node = jax.lax.while_loop(
        cond, block, (jnp.int32(lvl0), tag, done, node))
    out = stats[(offs + node).reshape(-1)].reshape(n_trees, batch, -1)
    return out[:, :, 0], out[:, :, 1:]


def _walk_forest_dense(tables, data, max_depth):
    """The production dense forest walk: all trees walked together with
    the tree axis folded into the gather index, splits folded into the
    projection-vector rows, and a while-loop early exit.

    The walk is GATHER-BOUND on TPU (per level per tree per point it
    must fetch that node's projection row; measured ~15.7 ms per million
    (W+1)-wide rows on v5e), so the restructuring attacks exactly that:

      * splits ride the vec rows as one extra column -- ONE row gather
        per (tree, point, level) instead of a row gather plus a flat
        gather (the flat gather alone measured 8.5 ms/M on v5e);
      * gini rides the proportion rows the same way at the end;
      * levels run under ``lax.while_loop`` and stop as soon as every
        (tree, point) pair has reached a leaf -- real forests terminate
        well before the static depth cap, and dead levels cost the full
        gather;
      * no vmap over trees: the (T, B) walk indexes a (T*SIZE, W+1)
        table directly (the vmapped formulation lowers to the same
        gathers plus batching overhead);
      * when the fit attached a blocked table (add_blocked_tables),
        the walk takes THREE levels per gather instead
        (:func:`_walk_forest_blocked`; 2.0x on v5e).

    Outputs are bit-identical to the :func:`_walk_one_tree_dense`
    formulation: the folded tables hold the same float32 values, the
    projection sum sees the same operands in the same order, and frozen
    (done) pairs are unchanged by extra levels.
    """
    if "dense_blk" in tables:
        return _walk_forest_blocked(tables, data, max_depth)
    dsplits = tables["dense_splits"]
    dvecs = tables["dense_vecs"]
    n_trees, size, dim = dvecs.shape
    batch = data.shape[0]
    # folded tables: one row gather per level, one at the end
    fvecs = jnp.concatenate(
        [dvecs, dsplits[:, :, None]], axis=2).reshape(
            n_trees * size, dim + 1)
    stats = jnp.concatenate(
        [tables["dense_ginis"][:, :, None], tables["dense_props"]],
        axis=2).reshape(n_trees * size, -1)
    offs = (jnp.arange(n_trees, dtype=jnp.int32) * size)[:, None]

    tag = jnp.ones((n_trees, batch), dtype=jnp.int32)
    done = jnp.zeros((n_trees, batch), dtype=bool)
    node = jnp.zeros((n_trees, batch), dtype=jnp.int32)

    def cond(carry):
        lvl, _, done, _ = carry
        return (lvl <= max_depth) & ~jnp.all(done)

    def level(carry):
        lvl, tag, done, node = carry
        row = fvecs[(offs + tag).reshape(-1)].reshape(
            n_trees, batch, dim + 1)
        split = row[:, :, dim]
        is_leaf = jnp.isinf(split)
        node = jnp.where((~done) & is_leaf, tag, node)
        done = done | is_leaf
        projection = jnp.sum(data[None] * row[:, :, :dim], axis=2)
        next_tag = (tag << 1) | (projection > split).astype(jnp.int32)
        tag = jnp.where(done, tag, next_tag)
        return lvl + 1, tag, done, node

    _, _, _, node = jax.lax.while_loop(
        cond, level, (jnp.int32(0), tag, done, node))
    out = stats[(offs + node).reshape(-1)].reshape(n_trees, batch, -1)
    return out[:, :, 0], out[:, :, 1:]


@functools.partial(jax.jit, static_argnames=("max_depth", "d_func"))
def _ensemble_proba(tables, data, max_depth, d_func):
    if "dense_splits" in tables:
        gini, proportions = _walk_forest_dense(tables, data, max_depth)
    else:
        walk = jax.vmap(
            lambda tg, sp, vc, gn, pr: _walk_one_tree(
                tg, sp, vc, gn, pr, data, max_depth))
        gini, proportions = walk(
            tables["tags"], tables["splits"], tables["vecs"],
            tables["ginis"], tables["props"])
    # gini: (T, B) -> weights (B, T, 1); proportions -> (B, T, C)
    weights = (1.0 - gini).T[:, :, None]
    proportions = jnp.transpose(proportions, (1, 0, 2))

    if d_func == "wmean":
        weights = weights / (jnp.sum(weights, axis=1, keepdims=True)
                             + jnp.float32(np.spacing(32)))
        return jnp.sum(proportions * weights, axis=1)
    if d_func == "wmax":
        return jnp.max(proportions * weights, axis=1)
    raise ValueError(f"unknown decision function {d_func!r}")
