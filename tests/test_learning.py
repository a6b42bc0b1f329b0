"""
Learning layer tests: RPT ensemble (fit semantics + batched XLA walk
against a pure-NumPy tree walk), softmax classifier, factory, metrics.
"""

import numpy as np
import pytest

from nimrud_tpu.learning import classifiers, linear, metrics
from nimrud_tpu.learning.rpt import RPTEnsemble


RNG = np.random.default_rng(10)


def _blobs(n_per_class=400, n_classes=3, dim=6, spread=0.8):
    centers = RNG.normal(size=(n_classes, dim)) * 4
    data, labels = [], []
    for c in range(n_classes):
        data.append(RNG.normal(centers[c], spread, (n_per_class, dim)))
        labels.append(np.full(n_per_class, c))
    return np.concatenate(data), np.concatenate(labels)


# ---------------------------------------------------------------------------
# RPT ensemble
# ---------------------------------------------------------------------------

def _numpy_tree_walk(rules, point, numlabs):
    """Reference-semantics recursive walk of one rule dict."""
    tag = 1
    while True:
        if tag not in rules:
            tag >>= 1
            split, vec, gini, props = rules[tag]
            return gini, props
        split, vec, gini, props = rules[tag]
        if np.isinf(split):
            return gini, props
        tag = (tag << 1) | int(point @ vec > split)


def test_rpt_fit_predict_accuracy():
    data, labels = _blobs()
    clf = RPTEnsemble(n_estimators=8, seed=0)
    clf.fit(data, labels)
    proba = clf.predict_proba(data)
    assert proba.shape == (len(data), 3)
    assert np.allclose(proba.sum(1), 1.0, atol=1e-3)
    accuracy = (clf.predict(data) == labels).mean()
    assert accuracy > 0.9, f"accuracy {accuracy}"


def test_rpt_fit_device_accuracy_and_tables():
    # the fully on-device forest fit (level-synchronous grow with
    # retry-in-place redraws) must reach host-fit accuracy and emit
    # dense tables the fused serving path consumes directly
    import jax.numpy as jnp
    data, labels = _blobs()
    host = RPTEnsemble(n_estimators=8, seed=0).fit(data, labels)
    acc_host = (host.predict(data) == labels).mean()

    dev = RPTEnsemble(n_estimators=8, seed=0)
    dev.fit_device(jnp.asarray(data.astype(np.float32)),
                   labels.astype(np.int32), n_classes=3)
    proba = np.asarray(dev.proba_device(
        jnp.asarray(data.astype(np.float32))))
    assert proba.shape == (len(data), 3)
    assert np.allclose(proba.sum(1), 1.0, atol=1e-3)
    acc_dev = (proba.argmax(1) == labels).mean()
    assert acc_dev > 0.9, f"device-fit accuracy {acc_dev}"
    assert acc_dev > acc_host - 0.05, (acc_host, acc_dev)
    assert "dense_splits" in dev._tables
    # leaves carry valid statistics everywhere the walk can land
    gin = np.asarray(dev._tables["dense_ginis"])
    assert np.isfinite(gin).all()


def test_rpt_fit_device_mesh_matches_single_device():
    # the distributed forest fit (round-4 VERDICT item 6): per-device
    # feature shards assembled per tree by disjoint scatter + psum,
    # each device growing its slice of the forest -- the dense tables
    # must be BIT-identical to single-device fit_device on the
    # device-major flattening of the valid rows, same seed
    import jax.numpy as jnp
    from nimrud_tpu.parallel import mesh as pmesh

    rng = np.random.default_rng(4)
    n_dev, rows, dim = 8, 100, 6
    feats = rng.random((n_dev, rows, dim)).astype(np.float32)
    valid = rng.random((n_dev, rows)) > 0.2
    labels = rng.integers(0, 3, (n_dev, rows)).astype(np.int32)

    single = RPTEnsemble(n_estimators=5, seed=11)
    single.fit_device(feats[valid], labels[valid], depth=8)

    mesh = pmesh.make_mesh(n_dev)
    dist = RPTEnsemble(n_estimators=5, seed=11)
    dist.fit_device_mesh(feats, valid, labels, mesh, depth=8)

    for key in single._tables:
        a = np.asarray(single._tables[key])
        b = np.asarray(dist._tables[key])
        assert a.shape == b.shape, (key, a.shape, b.shape)
        np.testing.assert_array_equal(a, b, err_msg=key)
    probe = rng.random((64, dim)).astype(np.float32)
    np.testing.assert_array_equal(
        single.predict_proba(probe), dist.predict_proba(probe))


def test_rpt_device_walk_matches_numpy_walk():
    data, labels = _blobs(n_per_class=200)
    clf = RPTEnsemble(n_estimators=4, seed=1)
    clf.fit(data, labels)

    test = RNG.normal(size=(50, data.shape[1])).astype(np.float32) * 3
    proba = clf.predict_proba(test)

    # oracle: walk every tree in NumPy, combine with wmean
    ginis = np.zeros((50, 4))
    props = np.zeros((50, 4, 3))
    for t, rules in enumerate(clf.trees_):
        for i, point in enumerate(test):
            g, p = _numpy_tree_walk(rules, point.astype(np.float64), 3)
            ginis[i, t] = g
            props[i, t] = p
    weights = (1 - ginis)[:, :, None]
    weights = weights / (weights.sum(1, keepdims=True) + np.spacing(32))
    oracle = (props * weights).sum(1)
    assert np.allclose(proba, oracle, atol=1e-5), \
        np.abs(proba - oracle).max()


def test_rpt_wmax():
    data, labels = _blobs(n_per_class=200)
    clf = RPTEnsemble(n_estimators=4, d_func="wmax", seed=2)
    clf.fit(data, labels)
    proba = clf.predict_proba(data[:100])
    assert proba.shape == (100, 3)
    assert (clf.predict(data) == labels).mean() > 0.85


def test_rpt_impurity_tuple_and_chunking():
    data, labels = _blobs(n_per_class=150)
    clf = RPTEnsemble(n_estimators=3, impurity=(0.1, 0.3), onepass=64,
                      seed=3)
    clf.fit(data, labels)
    proba = clf.predict_proba(data)          # forces multiple passes
    assert proba.shape == (len(data), 3)


def test_rpt_dead_leaf_backoff():
    # points far outside the training distribution must still get valid
    # probabilities (dead-leaf parent backoff)
    data, labels = _blobs(n_per_class=150)
    clf = RPTEnsemble(n_estimators=4, seed=4)
    clf.fit(data, labels)
    wild = RNG.normal(size=(20, data.shape[1])) * 100
    proba = clf.predict_proba(wild)
    assert np.all(np.isfinite(proba))
    assert np.allclose(proba.sum(1), 1.0, atol=1e-3)


def test_rpt_insufficient_data_rejected():
    data = RNG.normal(size=(10, 4))
    labels = np.array([0] * 9 + [1])
    with pytest.raises(ValueError):
        RPTEnsemble(n_estimators=5, seed=0).fit(data, labels)


def test_rpt_set_params():
    clf = RPTEnsemble()
    clf.set_params(n_estimators=7, d_func="wmax", impurity=(0.1, 0.2))
    assert clf.n_estimators == 7
    assert clf.d_func == "wmax"


# ---------------------------------------------------------------------------
# softmax classifier
# ---------------------------------------------------------------------------

def test_softmax_classifier():
    data, labels = _blobs()
    clf = linear.SoftmaxClassifier(epochs=30, seed=0)
    clf.fit(data, labels)
    proba = clf.predict_proba(data)
    assert proba.shape == (len(data), 3)
    assert np.allclose(proba.sum(1), 1.0, atol=1e-5)
    assert (clf.predict(data) == labels).mean() > 0.95


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------

def test_param_classifier_all_kinds():
    data, labels = _blobs(n_per_class=100)
    for kind, kwargs in [
            ("svm", {}),
            ("rf", {"n_estimators": 10}),
            ("erf", {"n_estimators": 10}),
            ("nb", {}),
            ("knn", {"n_neighbors": 3}),
            ("sgd", {}),
            ("rpte", {"n_estimators": 3, "seed": 0}),
            ("linear", {"epochs": 10})]:
        clf = classifiers.param_classifier(kind, **kwargs)
        clf.fit(data, labels)
        accuracy = (np.asarray(clf.predict(data)) == labels).mean()
        assert accuracy > 0.8, f"{kind}: accuracy {accuracy}"

    with pytest.raises(ValueError):
        classifiers.param_classifier("bogus")


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_mc_confusion():
    known = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([0, 1, 1, 1, 2, 0])
    conf = metrics.mc_confusion(pred, known)
    expected = np.array([
        [1, 0, 1],
        [1, 2, 0],
        [0, 0, 1]], dtype=float)
    assert np.array_equal(conf, expected)


def test_user_producer():
    conf = np.array([
        [8., 2.],
        [2., 8.]])
    user, producer = metrics.user_producer(conf)
    assert np.allclose(user, [80, 80])
    assert np.allclose(producer, [80, 80])


def test_three_metrics():
    conf = np.array([
        [9., 1.],
        [1., 9.]])
    scores = metrics.three_metrics(conf)
    assert scores.shape == (2, 3)
    assert np.allclose(scores[:, 0], [0.9, 0.9])     # tp rate
    assert np.allclose(scores[:, 1], [0.1, 0.1])     # fp rate
    assert np.allclose(scores[:, 2], [0.1, 0.1])     # fn rate


def test_three_metrics_rejects_unbalanced():
    # column totals 10 vs 20: the balanced-validation convention does not
    # apply and the rates would be silently wrong -- must raise
    conf = np.array([
        [9., 1.],
        [1., 19.]])
    with pytest.raises(ValueError, match="balanced"):
        metrics.three_metrics(conf)


def test_binary_confusion():
    labels = np.array([0, 0, 0, 1, 1, 1], dtype=float)
    pred = np.array([0, 0, 1, 1, 1, 0], dtype=float)
    a_comp, a_corr, a_qual, b_comp, b_corr, b_qual = \
        metrics.confusion(pred, labels)
    assert a_comp == pytest.approx(100 * 2 / 3)
    assert a_corr == pytest.approx(100 * 2 / 3)
    assert a_qual == pytest.approx(100 * 2 / 4)
    assert b_comp == pytest.approx(100 * 2 / 3)


def test_colorizers():
    cloud = np.hstack([RNG.random((10, 3)), RNG.integers(0, 3, (10, 1))])
    colored = metrics.colorize_multiclass(cloud)
    assert colored.shape == (10, 6)
    assert np.array_equal(
        colored[0, 3:], metrics.COLOR_MATRIX[int(cloud[0, 3])])

    probs = np.full((10, 3), 1 / 3)
    probs[np.arange(10), cloud[:, 3].astype(int)] = 1.0
    faded = metrics.colorize_mc_prob(cloud, probs)
    assert faded.shape == (10, 6)
    # probability-1 points get the pure class color
    assert np.allclose(
        faded[:, 3:],
        metrics.COLOR_MATRIX[cloud[:, 3].astype(int)])

    # probability-0 points are white
    probs_zero = probs * 0
    white = metrics.colorize_mc_prob(cloud, probs_zero)
    assert np.all(white[:, 3:] == 255)


def test_dilate_scale():
    matrix = np.array([[1.0, 2.0], [3.0, 4.0]])
    dilated = metrics.dilate_scale(matrix, 2)
    assert dilated.shape == (4, 4)
    assert dilated.max() == 1.0
    assert np.all(dilated[:2, :2] == 0.25)


def test_rpt_chain_pruning_is_exact():
    # terminal degenerate chains (the jittered median landing outside
    # the cell) collapse to leaves with identical statistics; inference
    # must be bit-identical to the unpruned forest
    data, labels = _blobs(600)
    probe = RNG.normal(size=(500, data.shape[1])).astype(np.float32) * 4
    raw = RPTEnsemble(n_estimators=5, seed=3, prune_chains=False)
    raw.fit(data, labels)
    pruned = RPTEnsemble(n_estimators=5, seed=3)
    pruned.fit(data, labels)
    assert sum(len(t) for t in pruned.trees_) \
        < sum(len(t) for t in raw.trees_)
    a = raw.predict_proba(probe)
    b = pruned.predict_proba(probe)
    assert np.array_equal(a, b), np.abs(a - b).max()


def test_rpt_folded_forest_walk_is_bit_identical():
    # the production walk (_walk_forest_dense: tree axis folded into the
    # gather index, splits folded into the vec rows, while-loop early
    # exit) must reproduce the per-tree fori_loop formulation BIT
    # exactly -- same float32 operands in the same order
    import jax.numpy as jnp
    from nimrud_tpu.learning import rpt

    data, labels = _blobs(n_per_class=300)
    # fit_device is the production source of dense tables (host fits
    # can exceed the depth<=14 dense-packing bound via jitter chains)
    clf = RPTEnsemble(n_estimators=5, seed=7)
    clf.fit_device(jnp.asarray(data.astype(np.float32)),
                   labels.astype(np.int32), n_classes=3, depth=9)
    assert "dense_splits" in clf._tables
    probe = jnp.asarray(
        RNG.normal(size=(512, data.shape[1])).astype(np.float32) * 3)

    t = clf._tables
    assert "dense_blk" in t        # dim=6 -> 49 lanes, blocked eligible
    import jax
    gini_ref, props_ref = jax.vmap(
        lambda sp, vc, gn, pr: rpt._walk_one_tree_dense(
            sp, vc, gn, pr, probe, clf.max_depth_))(
        t["dense_splits"], t["dense_vecs"],
        t["dense_ginis"], t["dense_props"])
    # production dispatch (blocked: 3 levels per gather) AND the
    # per-level fallback (wide-feature forests) must both match
    for tables in (t, {k: v for k, v in t.items() if k != "dense_blk"}):
        gini_new, props_new = rpt._walk_forest_dense(
            tables, probe, clf.max_depth_)
        np.testing.assert_array_equal(np.asarray(gini_new),
                                      np.asarray(gini_ref))
        np.testing.assert_array_equal(np.asarray(props_new),
                                      np.asarray(props_ref))


def test_rpt_blocked_walk_chunking_is_bit_identical():
    # the point-chunked blocked walk (bounds the (T, chunk, 7*(W+1))
    # gather transient that OOMed the 1M rpte serving step) must equal
    # the one-shot walk bitwise, including the non-divisible pad tail
    import jax.numpy as jnp
    from nimrud_tpu.learning import rpt

    data, labels = _blobs(n_per_class=200)
    clf = RPTEnsemble(n_estimators=4, seed=3)
    clf.fit_device(jnp.asarray(data.astype(np.float32)),
                   labels.astype(np.int32), n_classes=3, depth=8)
    probe = jnp.asarray(
        RNG.normal(size=(3001, data.shape[1])).astype(np.float32) * 3)
    saved = rpt._BLK_POINT_CHUNK
    try:
        rpt._BLK_POINT_CHUNK = 512            # 5 full chunks + pad 71
        g1, p1 = rpt._walk_forest_dense(clf._tables, probe,
                                        clf.max_depth_)
    finally:
        rpt._BLK_POINT_CHUNK = saved
    g2, p2 = rpt._walk_forest_dense(clf._tables, probe, clf.max_depth_)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_rpt_dense_walk_matches_sparse_walk():
    # the direct-index (dense) packing must reproduce the searchsorted
    # walk exactly, including dead-leaf parent backoff -- hand-built
    # shallow forest with a dead branch (code 5 missing: points routed
    # right at node 2 must back off to node 2's statistics)
    dim, C = 3, 2
    leaf = np.float32(np.inf)
    v = np.zeros(dim)
    tree = {
        1: (0.0, np.array([1.0, 0, 0]), 0.5, np.array([0.5, 0.5])),
        2: (0.0, np.array([0, 1.0, 0]), 0.4, np.array([0.7, 0.3])),
        3: (leaf, v, 0.1, np.array([0.1, 0.9])),
        4: (leaf, v, 0.2, np.array([0.9, 0.1])),
        # code 5 deliberately missing: dead branch
    }
    clf = RPTEnsemble(n_estimators=1)
    clf.dim, clf.numlabs = dim, C
    clf.trees_ = [tree]
    clf._tables = clf._flatten([tree])
    assert "dense_splits" in clf._tables

    probe = RNG.normal(size=(256, dim)).astype(np.float32) * 2
    dense = clf.predict_proba(probe)
    clf._tables = {k: u for k, u in clf._tables.items()
                   if not k.startswith("dense_")}
    sparse = clf.predict_proba(probe)
    assert np.array_equal(dense, sparse)
    # dead-branch points really hit the backoff stats
    dead = (probe[:, 0] <= 0) & (probe[:, 1] > 0)
    assert np.allclose(dense[dead], [0.7, 0.3])
