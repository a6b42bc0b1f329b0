"""
GeometryClassifier end-to-end: device fit, single-dispatch fused predict
(linear + rpte), fallback equivalence.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nimrud_tpu.pipeline import GeometryClassifier


RNG = np.random.default_rng(10)


def _scene(per=1500):
    sheet = RNG.random((per, 3)) * [8, 8, 0.02]
    line = RNG.random((per, 3)) * [0.02, 0.02, 8] + [10, 4, 0]
    blob = RNG.normal([16, 4, 4], 1.0, (per, 3))
    cloud = np.vstack([sheet, line, blob]).astype(np.float32)
    labels = np.repeat([0, 1, 2], per)
    return cloud, labels


def test_linear_device_fit_and_fused_predict():
    cloud, labels = _scene()
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 25})
    model.fit(cloud, labels)
    # device fit keeps parameters as jax arrays
    assert not isinstance(model.classifier.params["w"], np.ndarray)

    predicted = model.predict(cloud)
    accuracy = (predicted == labels).mean()
    assert accuracy > 0.95, accuracy

    # fused path was taken and equals the multi-dispatch fallback
    assert model._fused_band_specs(cloud, cloud) is not None
    probs = model.predict_proba_device(cloud)
    fallback = np.asarray(jnp.argmax(probs, axis=1))
    assert (predicted == fallback).mean() > 0.999


def test_rpte_fused_predict():
    cloud, labels = _scene(per=800)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="rpte",
        classifier_kwargs={"n_estimators": 6, "seed": 0})
    model.fit(cloud, labels, sample=1500)
    assert model._fused_band_specs(cloud, cloud) is not None

    predicted = model.predict(cloud)
    assert (predicted == labels).mean() > 0.7

    # equals the non-fused rpte inference
    feats = model.extract(cloud)
    direct = model.classifier.predict(feats)
    assert (predicted == direct).mean() > 0.999


def test_sklearn_classifier_falls_back():
    cloud, labels = _scene(per=400)
    model = GeometryClassifier(
        [(0.2, (0.6,))], kind="minimal", classifier="erf",
        classifier_kwargs={"n_estimators": 10})
    model.fit(cloud, labels)
    assert model._fused_band_specs(cloud, cloud) is None
    predicted = model.predict(cloud)
    assert (predicted == labels).mean() > 0.8


@pytest.mark.slow
def test_uint16_transfer_matches_float32():
    # quantized (uint16) cloud uploads: mm-scale resolution, identical
    # predictions at half the transfer volume
    cloud, labels = _scene(per=1200)
    kwargs = dict(kind="minimal", classifier="linear",
                  classifier_kwargs={"epochs": 25})
    m32 = GeometryClassifier([(0.2, (0.8, 0.4))], **kwargs)
    m32.fit(cloud, labels)
    m16 = GeometryClassifier([(0.2, (0.8, 0.4))],
                             transfer_dtype="uint16", **kwargs)
    m16.classifier = m32.classifier       # same weights, only transfer differs
    p32 = m32.predict(cloud)
    p16 = m16.predict(cloud)
    assert (p16 == p32).mean() > 0.995

    import pytest as _pytest
    with _pytest.raises(ValueError):
        GeometryClassifier([(0.2, (0.4,))], transfer_dtype="int8")


def test_staged_and_stream_match_predict():
    # stage()/predict_staged() is predict_device() split at the upload
    # boundary; predict_stream() yields the same labels per cloud
    cloud, labels = _scene(per=900)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 25}, transfer_dtype="uint16")
    model.fit(cloud, labels)

    direct = model.predict(cloud)
    staged = model.stage(cloud)
    assert staged is not None
    via_staged = np.asarray(model.predict_staged(staged))
    assert (via_staged == direct).all()

    shifted = cloud + np.float32([0.5, 0, 0])
    streamed = [np.asarray(out)
                for out in model.predict_stream([cloud, shifted])]
    assert (streamed[0] == direct).all()
    assert (streamed[1] == model.predict(shifted)).all()

    # non-fused configurations stream through the fallback path
    fallback = GeometryClassifier(
        [(0.2, (0.6,))], kind="minimal", classifier="erf",
        classifier_kwargs={"n_estimators": 10})
    fallback.fit(cloud, labels)
    assert fallback.stage(cloud) is None
    out = list(fallback.predict_stream([cloud]))
    assert (np.asarray(out[0]) == fallback.predict(cloud)).all()


def test_vector_kind_fused_predict():
    # V_MSO serving: attribute features through the single-dispatch
    # fused predict, matching the multi-dispatch fallback
    cloud, labels = _scene(per=800)
    # class-correlated attributes so the classifier has signal
    attrs = np.stack([labels + 0.05 * RNG.standard_normal(len(labels)),
                      RNG.random(len(labels))], axis=1).astype(np.float32)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="vector", classifier="linear",
        classifier_kwargs={"epochs": 25})
    model.fit(cloud, labels, attributes=attrs)
    predicted = model.predict(cloud, attributes=attrs)
    assert (predicted == labels).mean() > 0.9

    staged = model.stage(cloud, attributes=attrs)
    assert staged is not None           # fused path applies
    assert (np.asarray(model.predict_staged(staged)) == predicted).all()

    # fallback equivalence
    probs = model.predict_proba_device(cloud, attributes=attrs)
    fallback = np.asarray(jnp.argmax(probs, axis=1))
    assert (predicted == fallback).mean() > 0.99

    # vector without attributes cannot stage or predict
    assert model.stage(cloud) is None


def test_fixed_bounds_share_one_program():
    # fixed site bounds: every cloud in a stream maps to IDENTICAL static
    # specs (no per-cloud recompile), and accuracy holds
    cloud, labels = _scene(per=700)
    lo = cloud.min(0) - 1.0
    hi = cloud.max(0) + 1.0
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 25}, bounds=(lo, hi),
        transfer_dtype="uint16")
    model.fit(cloud, labels)

    jittered = cloud + np.float32([0.21, -0.13, 0.05])
    inside = np.all((jittered >= lo) & (jittered <= hi), axis=1)
    s1 = model.stage(cloud)
    s2 = model.stage(jittered)
    assert s1["specs"] == s2["specs"]          # same compiled program
    assert s1["dequant"] is not None
    assert np.allclose(np.asarray(s1["dequant"]),
                       np.asarray(s2["dequant"]))
    p = np.asarray(model.predict_staged(s2))
    assert (p[inside] == labels[inside]).mean() > 0.9


@pytest.mark.slow
def test_trim_entries_serving_cache():
    # with fixed bounds + trim_entries, fit caches occupancy-sized specs
    # and serving reuses them; predictions must match the untrimmed model
    cloud, labels = _scene(per=700)
    lo, hi = cloud.min(0) - 1.0, cloud.max(0) + 1.0
    kwargs = dict(kind="minimal", classifier="linear",
                  classifier_kwargs={"epochs": 25, "seed": 0},
                  bounds=(lo, hi))
    base = GeometryClassifier([(0.2, (0.8, 0.4))], **kwargs)
    base.fit(cloud, labels)
    trim = GeometryClassifier([(0.2, (0.8, 0.4))], trim_entries=True,
                              **kwargs)
    trim.fit(cloud, labels)
    assert trim._spec_cache is not None
    _, cached = trim._spec_cache
    plain = base._fused_band_specs(cloud, cloud)
    assert all(c[1].e_cap <= p[1].e_cap
               for c, p in zip(cached, plain))
    shifted = cloud + np.float32([0.3, 0, 0])
    assert (trim.predict(shifted) == base.predict(shifted)).all()


def test_fit_with_sampling():
    cloud, labels = _scene(per=600)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 30})
    model.fit(cloud, labels, sample=800)
    assert (model.predict(cloud) == labels).mean() > 0.85

@pytest.mark.slow
def test_predict_multichip_matches_single_chip():
    # the whole serving pipeline (fused extract + classifier) under
    # shard_map on the 2-D tile mesh must agree with single-chip predict
    cloud, labels = _scene(per=900)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 25})
    model.fit(cloud, labels)

    single = model.predict(cloud)
    multi = model.predict_multichip(cloud, mesh_shape=(4, 2))
    assert multi.shape == single.shape
    assert multi.dtype == np.int32
    # shard-boundary points whose neighborhoods sit exactly on a radius
    # shell can flip a single neighbor between compiled programs; the
    # class decision must still agree essentially everywhere
    agree = (multi == single).mean()
    assert agree > 0.999, agree
    assert (multi == labels).mean() > 0.95


def test_predict_multichip_rejects_unsupported():
    import pytest
    cloud, labels = _scene(per=300)
    unfit = GeometryClassifier([(0.2, (0.5,))], classifier="linear")
    with pytest.raises(ValueError, match="fitted"):
        unfit.predict_multichip(cloud, mesh_shape=(2, 2))
    dense_band = GeometryClassifier(
        [(0.0, (0.5,))], classifier="linear",
        classifier_kwargs={"epochs": 5})
    dense_band.fit(cloud, labels)
    with pytest.raises(ValueError, match="voxelized"):
        dense_band.predict_multichip(cloud, mesh_shape=(2, 2))


def test_fit_features_match_serving_under_fixed_bounds():
    # REGRESSION (round 4): with fixed site bounds= the serving grids
    # anchor at the MODEL bounds, but extract_device used to anchor the
    # voxel downsample at the SEARCH cloud's own bounds -- a different
    # voxel set, so fit() trained on systematically different features
    # than predict() served (anti-predictive models whenever the bounds
    # padding wasn't an integer multiple of the voxel edge).  Fit
    # features and fused-serving decisions must now agree exactly.
    import jax.numpy as jnp
    cloud, labels = _scene(per=900)
    jitter = RNG.normal(0, 0.02, cloud.shape).astype(np.float32)
    search = (cloud + jitter).astype(np.float32)
    # bounds padding deliberately NOT a multiple of the 0.2 voxel edge
    lo = np.minimum(cloud.min(0), search.min(0)) - 0.5
    hi = np.maximum(cloud.max(0), search.max(0)) + 0.5
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 15, "seed": 0},
        backend="packed", bounds=(lo, hi))
    model.fit(cloud, labels, search=search)
    feats = model.extract_device(cloud, search)
    from_fit = np.asarray(
        model.classifier.proba_device(jnp.asarray(feats))).argmax(1)
    served = np.asarray(
        model.predict_staged(model.stage(cloud, search=search)))
    np.testing.assert_array_equal(from_fit, served[:cloud.shape[0]])


def test_staged_search_matches_per_cloud():
    # designated-search serving (round-4 VERDICT item 2): stage_search
    # precomputes the per-band dedup + span count tables ONCE; clouds
    # streamed against the map must classify BIT-identically to the
    # per-cloud path (same tile-sorted rows, same tables, same kernel
    # sweep), for geometry AND vector kinds
    cloud, labels = _scene(per=500)
    rng = np.random.default_rng(9)
    # a designated search map distinct from the query clouds
    search = (cloud + rng.normal(0, 0.03, cloud.shape)).astype(
        np.float32)
    lo = np.minimum(cloud.min(0), search.min(0)) - 0.5
    hi = np.maximum(cloud.max(0), search.max(0)) + 0.5

    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 20}, backend="packed",
        bounds=(lo, hi))
    model.fit(cloud, labels, search=search)

    handle = model.stage_search(search)

    # op-level bit-identity: the staged tables must drive the multi
    # program to EXACTLY the per-cloud features (same sorted rows, same
    # spans, same sweep); the full predict program only adds the
    # classifier matmul, whose reassociation can differ between two
    # separately compiled programs
    import jax.numpy as jnp
    from nimrud_tpu.features import multiscale
    from nimrud_tpu.ops import device_grid, unique
    band = model._fused_band_specs(cloud, search)[0]
    q_bucket = multiscale._pow2_bucket(cloud.shape[0])
    q_dev = jnp.asarray(multiscale._pad_rows_f32(cloud, q_bucket))
    q_valid = jnp.arange(q_bucket) < cloud.shape[0]
    s_bucket = multiscale._pow2_bucket(search.shape[0])
    s_dev = jnp.asarray(multiscale._pad_rows_f32(search, s_bucket))
    s_valid = jnp.arange(s_bucket) < search.shape[0]
    centers, _, mask = unique.unique_voxels(
        s_dev, band[0], valid=s_valid, tile_spec=band[1])
    kw = dict(interpret=True, with_stats=True)
    f_inline, _ = device_grid.fused_extract_packed_multi(
        q_dev, q_valid, (centers,), (mask,), band[1], (band[1],),
        (band[2],), "minimal", None, cloud.shape[0], (band[5],),
        presorted=True, **kw)
    f_staged, _ = device_grid.fused_extract_packed_multi(
        q_dev, q_valid, (q_dev[:1],), (jnp.ones(1, bool),), band[1],
        (band[1],), (band[2],), "minimal", None, cloud.shape[0],
        (band[5],), search_tables=handle["tables"], **kw)
    np.testing.assert_array_equal(np.asarray(f_inline),
                                  np.asarray(f_staged))

    jitter = (cloud + rng.normal(0, 0.01, cloud.shape)).astype(
        np.float32)
    for q in (cloud, jitter):
        a = model.predict_staged(model.stage(q, search=search),
                                 with_proba=True)
        b = model.predict_staged(model.stage(q, staged_search=handle),
                                 with_proba=True)
        np.testing.assert_array_equal(np.asarray(a[0]),
                                      np.asarray(b[0]))
        assert np.allclose(np.asarray(a[1]), np.asarray(b[1]),
                           atol=1e-3)

    # streaming against the handle: same program, same labels
    streamed = list(model.predict_stream([cloud, jitter],
                                         staged_search=handle))
    for q, lab in zip((cloud, jitter), streamed):
        ref = model.predict_staged(model.stage(q, staged_search=handle))
        np.testing.assert_array_equal(np.asarray(lab), np.asarray(ref))
    # and it must refuse to silently fall back to self-search
    unfused = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        backend="xla", bounds=(lo, hi))
    with pytest.raises(ValueError, match="packed"):
        list(unfused.predict_stream([cloud], staged_search=handle))

    # vector kind: attributes belong to the handle
    attrs = np.stack([search[:, 2], np.sin(search[:, 0])],
                     axis=1).astype(np.float32)
    vec = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="vector", classifier="linear",
        classifier_kwargs={"epochs": 20}, backend="packed",
        bounds=(lo, hi))
    vec.fit(cloud, labels, search=search, attributes=attrs)
    vh = vec.stage_search(search, attributes=attrs)
    a = vec.predict_staged(
        vec.stage(cloud, search=search, attributes=attrs))
    b = vec.predict_staged(vec.stage(cloud, staged_search=vh))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a handle must not silently serve a DIFFERENT configuration: the
    # tables encode grids derived from scaleset/kind/bounds, and a
    # mismatch would produce garbage labels with zero diagnostics
    other = GeometryClassifier(
        [(0.25, (0.8, 0.4))], kind="minimal", classifier="linear",
        backend="packed", bounds=(lo, hi))
    with pytest.raises(ValueError, match="different model"):
        other.stage(cloud, staged_search=handle)
    unbounded = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        backend="packed")
    with pytest.raises(ValueError, match="bounds"):
        unbounded.stage(cloud, staged_search=handle)


def test_designated_staging_never_quantizes_queries():
    # under transfer_dtype="uint16" designated staging must upload RAW
    # f32 queries: the handle's tables hold raw f32 search rows, and a
    # quantized query would flip d2 boundary decisions, breaking the
    # bit-identity contract with the per-cloud path (which uploads
    # distinct-search queries as f32).  The uint16 fast upload is a
    # SELF-search-only optimization.
    import jax.numpy as jnp
    cloud, labels = _scene(per=500)
    lo, hi = cloud.min(0) - 0.5, cloud.max(0) + 0.5
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 2}, backend="packed",
        bounds=(lo, hi), transfer_dtype="uint16")
    model.fit(cloud, labels)
    handle = model.stage_search(cloud)
    staged = model.stage(cloud, staged_search=handle)
    assert staged is not None
    assert staged["dequant"] is None
    assert staged["query"].dtype == jnp.float32
    # while self-search staging still takes the quantized upload
    st_self = model.stage(cloud)
    assert st_self["dequant"] is not None


def test_removed_backend_fails_loudly():
    # a model unpickled from a version whose backend was since removed
    # (round-3 "ragged") must raise at the first .backend read, not
    # silently serve the ~30x-slower XLA fallback
    model = GeometryClassifier([(0.2, (0.8, 0.4))], kind="minimal",
                               classifier="linear", backend="packed")
    model._backend = "ragged"
    with pytest.raises(ValueError, match="unknown serving backend"):
        model.backend


@pytest.mark.slow
def test_predict_multichip_vector():
    # kind="vector" (V_MSO) under the 2-D serving mesh: attributes
    # shard and halo-exchange with their points, each shard
    # interpolates them onto its voxel centers, and the packed kernel
    # computes the attribute means natively -- labels must agree with
    # single-chip vector predict
    cloud, labels = _scene(per=600)
    attrs = np.stack(
        [cloud[:, 2], np.sin(cloud[:, 0])], axis=1).astype(np.float32)
    for backend in ("packed", "xla"):
        model = GeometryClassifier(
            [(0.2, (0.8, 0.4))], kind="vector", classifier="linear",
            classifier_kwargs={"epochs": 25}, backend=backend)
        model.fit(cloud, labels, attributes=attrs)
        single = model.predict(cloud, attributes=attrs)
        multi = model.predict_multichip(
            cloud, mesh_shape=(4, 2), attributes=attrs)
        agree = (multi == single).mean()
        assert agree > 0.999, (backend, agree)


@pytest.mark.slow
def test_predict_multichip_rpte():
    # the rpte device walk (scan over a replicated carry) under the
    # serving shard_map
    cloud, labels = _scene(per=400)
    model = GeometryClassifier(
        [(0.2, (0.8,))], kind="minimal", classifier="rpte",
        classifier_kwargs={"n_estimators": 4, "seed": 0})
    model.fit(cloud, labels)
    multi = model.predict_multichip(cloud, mesh_shape=(2, 2))
    single = model.predict(cloud)
    assert (multi == single).mean() > 0.99


@pytest.mark.slow
def test_pallas_backend_matches_xla_predict():
    # the span-DMA moment kernel behind the fused single-dispatch
    # predict: same labels as the XLA candidate-table path
    cloud, labels = _scene(per=800)
    kw = dict(kind="minimal", classifier="linear",
              classifier_kwargs={"epochs": 10, "seed": 0},
              bounds=(cloud.min(0), cloud.max(0)))
    xla = GeometryClassifier([(0.2, (0.8, 0.4))], **kw)
    xla.fit(cloud, labels, sample=1200)
    spans = GeometryClassifier([(0.2, (0.8, 0.4))], backend="pallas", **kw)
    spans.fit(cloud, labels, sample=1200)
    a = xla.predict(cloud)
    b = spans.predict(cloud)
    assert (a == b).mean() > 0.999, (a == b).mean()


def test_packed_backend_matches_xla_predict_multiband():
    # the packed-candidate backend runs ALL bands of the scaleset in
    # one shared-query-plan program (fused_extract_packed_multi); its
    # labels must match the XLA candidate-table path, and the serving
    # diag must carry the dropped_candidates counter
    cloud, labels = _scene(per=800)
    scaleset = [(0.2, (0.8, 0.4)), (0.4, (1.6,))]
    kw = dict(kind="minimal", classifier="linear",
              classifier_kwargs={"epochs": 10, "seed": 0},
              bounds=(cloud.min(0), cloud.max(0)))
    xla = GeometryClassifier(scaleset, **kw)
    xla.fit(cloud, labels, sample=1200)
    packed = GeometryClassifier(scaleset, backend="packed",
                                trim_entries=True, **kw)
    packed.fit(cloud, labels, sample=1200)
    staged = packed.stage(cloud)
    assert staged is not None
    assert all(band[5] is not None for band in staged["specs"])
    b, diag = packed.predict_staged(staged, with_diag=True)
    a = xla.predict(cloud)
    b = np.asarray(b)[:len(a)]
    assert (a == b).mean() > 0.999, (a == b).mean()
    assert int(diag["dropped_candidates"]) == 0


@pytest.mark.slow
def test_packed_split_caps_match_xla():
    # heavy-tailed candidate totals (a dense cluster inside a sparse
    # site) make span_host.candidate_caps_split return a multi-bucket
    # (caps, bounds) capacity; the bucketed kernel launches must
    # reproduce the XLA path's labels exactly.  A local generator: the
    # split/no-split decision depends on the exact draws, so it must
    # not drift with test execution order.
    rng = np.random.default_rng(0)
    sparse = (rng.random((2000, 3)) * [20, 20, 4]).astype(np.float32)
    dense = rng.normal([10, 10, 2], 0.15, (2000, 3)).astype(np.float32)
    cloud = np.vstack([sparse, dense]).astype(np.float32)
    labels = np.repeat([0, 1], 2000)
    kw = dict(kind="minimal", classifier="linear",
              classifier_kwargs={"epochs": 10, "seed": 0},
              bounds=(cloud.min(0), cloud.max(0)))
    scaleset = [(0.2, (0.8, 0.4))]
    xla = GeometryClassifier(scaleset, **kw)
    xla.fit(cloud, labels, sample=1500)
    packed = GeometryClassifier(scaleset, backend="packed",
                                trim_entries=True, **kw)
    packed.fit(cloud, labels, sample=1500)
    staged = packed.stage(cloud)
    split_caps = [band[5] for band in staged["specs"]]
    assert any(isinstance(c, tuple) for c in split_caps), split_caps
    b, diag = packed.predict_staged(staged, with_diag=True)
    assert int(diag["dropped_candidates"]) == 0
    a = xla.predict(cloud)
    assert np.array_equal(a, np.asarray(b)[:len(a)])


@pytest.mark.slow
def test_packed_chunked_serving_matches_unchunked():
    # the 10M+ workloads serve with the per-slot pipeline chunked over
    # entries under lax.map (bounded peak HBM); labels AND
    # probabilities must match the un-chunked program exactly
    cloud, labels = _scene(per=800)
    scaleset = [(0.2, (0.8, 0.4)), (0.4, (1.6,))]
    kw = dict(kind="minimal", classifier="linear",
              classifier_kwargs={"epochs": 10, "seed": 0},
              bounds=(cloud.min(0), cloud.max(0)), backend="packed",
              trim_entries=True)
    base = GeometryClassifier(scaleset, **kw)
    base.fit(cloud, labels, sample=1200)
    chunked = GeometryClassifier(scaleset, serving_chunk_slots=1024,
                                 **kw)
    chunked.fit(cloud, labels, sample=1200)

    sa = base.stage(cloud)
    sb = chunked.stage(cloud)
    la, pa, da = base.predict_staged(sa, with_proba=True, with_diag=True)
    lb, pb, db = chunked.predict_staged(sb, with_proba=True,
                                        with_diag=True)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert int(da["dropped_candidates"]) == int(db["dropped_candidates"])
    # labels-only variant exercises the probability-free reduce
    lb2 = chunked.predict_staged(sb)
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(lb2))


@pytest.mark.slow
def test_vector_wide_attrs_staged_matmul_interp():
    # wide attribute blocks (A > 8) route the staged V_MSO interpolation
    # through the moment matmul (ops.interp.interp_to_voxels_matmul);
    # labels must match the multi-dispatch extract path, which applies
    # the same auto rule
    cloud, labels = _scene(per=600)
    n = len(labels)
    attrs = np.concatenate([
        np.stack([labels + 0.05 * RNG.standard_normal(n)], axis=1),
        RNG.random((n, 11))], axis=1).astype(np.float32)
    model = GeometryClassifier(
        [(0.2, (0.8,))], kind="vector", classifier="linear",
        classifier_kwargs={"epochs": 25, "seed": 0})
    model.fit(cloud, labels, attributes=attrs)

    staged = model.stage(cloud, attributes=attrs)
    assert staged is not None
    assert staged["specs"][0][3] is not None  # interp spec present
    fused = np.asarray(model.predict_staged(staged))

    probs = model.predict_proba_device(cloud, attributes=attrs)
    fallback = np.asarray(jnp.argmax(probs, axis=1))
    assert (fused == fallback).mean() > 0.999, (fused == fallback).mean()
    # 11 of the 12 attribute columns are noise, so the bar is modest
    assert (fused == labels).mean() > 0.8


def test_trimmed_search_capacity_counts_overflow():
    # trim_entries sizes the per-band voxel capacity from the FIT cloud;
    # serving a much denser cloud must not fail silently -- the staged
    # diagnostic counts the voxels beyond capacity
    # fit cloud: 40k points packed into a 4 m corner of the 40 m site
    # (few voxels -> small v_cap); serving cloud: the same point count
    # spread over the whole site (many more voxels, same pow2 bucket so
    # the cached trimmed specs apply)
    rng = np.random.default_rng(7)
    packed = (rng.random((40_000, 3)) * 4).astype(np.float32)
    labels = (packed[:, 2] > 2).astype(np.int32)
    model = GeometryClassifier(
        [(0.25, (0.5,))], kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 3, "seed": 0},
        bounds=(np.zeros(3, np.float32), np.full(3, 40, np.float32)),
        trim_entries=True, backend="pallas")
    model.fit(packed, labels)
    specs = model._spec_cache[1]
    assert specs[0][4] is not None                 # v_cap engaged

    st = model.stage(packed)
    _, diag = model.predict_staged(st, with_diag=True)
    assert int(diag["vox_dropped"]) == 0

    spread = (rng.random((40_000, 3)) * 40).astype(np.float32)
    st = model.stage(spread)
    labels_dev, diag = model.predict_staged(st, with_diag=True)
    assert labels_dev.shape[0] == len(spread)
    assert int(diag["vox_dropped"]) > 0            # counted, not silent
