"""
Pallas fused moment kernel vs the float64 brute-force oracle and the XLA
entry-stats path (interpreter mode on CPU).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from nimrud_tpu.ops.pallas import multiscale_kernel as pk


RNG = np.random.default_rng(10)


def _entries(n_entries=4, q_cap=16, flat=128):
    q = (RNG.random((n_entries, q_cap, 3)) * 2 - 1).astype(np.float32)
    s = (RNG.random((n_entries, flat, 3)) * 2 - 1).astype(np.float32)
    valid = RNG.random((n_entries, flat)) < 0.8
    return q, s, valid


def test_entry_moments_against_oracle():
    radii = (1.0, 0.5)
    q, s, valid = _entries()
    slabs = np.asarray(pk.entry_moments(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(valid), radii,
        interpret=True))

    for e in range(q.shape[0]):
        for ri, radius in enumerate(radii):
            slab = slabs[e, :, ri * pk.MOMENT_PAD:(ri + 1) * pk.MOMENT_PAD]
            for qi in range(q.shape[1]):
                d = np.linalg.norm(
                    s[e].astype(np.float64) - q[e, qi].astype(np.float64),
                    axis=1)
                mask = (d <= radius) & valid[e]
                pts = s[e][mask].astype(np.float64)
                assert slab[qi, 0] == len(pts), (e, ri, qi)
                if len(pts) == 0:
                    continue
                assert np.allclose(slab[qi, 1:4], pts.sum(0), atol=1e-4)
                second = np.stack([
                    (pts[:, 0] * pts[:, 0]).sum(),
                    (pts[:, 0] * pts[:, 1]).sum(),
                    (pts[:, 0] * pts[:, 2]).sum(),
                    (pts[:, 1] * pts[:, 1]).sum(),
                    (pts[:, 1] * pts[:, 2]).sum(),
                    (pts[:, 2] * pts[:, 2]).sum()])
                assert np.allclose(slab[qi, 4:10], second, atol=1e-4)
                assert np.all(slab[qi, 10:] == 0)


def test_moments_from_slabs_matches_xla_stats():
    import jax
    from nimrud_tpu.ops.grid import _entry_stats

    radii = (0.8, 0.4)
    q, s, valid = _entries(n_entries=3, q_cap=8, flat=64)
    centers = RNG.random((3, 3)).astype(np.float32)

    slabs = pk.entry_moments(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(valid), radii,
        interpret=True)
    ours = pk.moments_from_slabs(slabs, jnp.asarray(centers), radii)

    # the XLA path consumes aug with attribute columns; emulate none
    x, y, z = (jnp.asarray(s[..., i]) for i in range(3))
    aug = jnp.stack(
        [jnp.ones_like(x), x, y, z, x * x, x * y, x * z, y * y, y * z,
         z * z], axis=-1)
    theirs = _entry_stats(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(valid), aug, radii,
        None, precision=jax.lax.Precision.HIGHEST)

    for mine, ref in zip(ours, theirs):
        assert np.allclose(np.asarray(mine["count"]),
                           np.asarray(ref["count"]))
        have = np.asarray(ref["count"]) > 0
        assert np.allclose(np.asarray(mine["mean_local"])[have],
                           np.asarray(ref["mean_local"])[have], atol=1e-5)
        assert np.allclose(np.asarray(mine["cov"])[have],
                           np.asarray(ref["cov"])[have], atol=1e-5)


@pytest.mark.slow
def test_span_entry_batching_matches_unbatched():
    # entries_per_step changes DMA scheduling only, never results; a
    # batch that does not divide the padded entry count exercises the
    # pad-entries path (zero-length spans, zero queries)
    from nimrud_tpu.features.multiscale import extract_scaleset
    rng = np.random.default_rng(12)
    search = (rng.random((4000, 3)) * [12, 12, 4]).astype(np.float32)
    query = search[:1024]
    scaleset = [(0.5, (1.0,))]
    one = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas", "span_batch": 1}))
    three = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas", "span_batch": 3}))
    assert np.array_equal(one, three)


def test_span_backend_matches_xla_fused():
    # the DMA-gather (span) kernel against the XLA fused path on the
    # same voxel-downsampled scene: same neighbor sets by construction
    # (voxel-derived s_cap never overflows), so features must agree
    from nimrud_tpu.features.multiscale import extract_scaleset
    rng = np.random.default_rng(11)
    search = (rng.random((20000, 3)) * [20, 20, 5]).astype(np.float32)
    query = search[:4096]
    scaleset = [(0.4, (1.2, 0.6))]
    xla = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused"))
    spans = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas"}))
    assert spans.shape == xla.shape
    pop_same = xla[:, 0] == spans[:, 0]
    assert pop_same.mean() > 0.999, pop_same.mean()
    # row-packed entries recenter moments on a (wide) segment frame, so
    # f32 accumulation order differs from the XLA per-tile frame; the
    # parallel-axis cov reconstruction amplifies that by (query - center
    # distance)^2.  Populations stay exact; features drift ~3e-4 abs.
    assert np.allclose(spans[pop_same], xla[pop_same], atol=1e-3), \
        np.abs(spans[pop_same] - xla[pop_same]).max()


@pytest.mark.slow
def test_span_bf16x2_precision_counts_exact():
    # the 2-pass bf16 hi+lo moment dot: populations must be EXACT (the
    # 0/1 mask and the ones row are bf16-representable); other features
    # within the reconstructed ~16-bit mantissa
    from nimrud_tpu.features.multiscale import extract_scaleset
    rng = np.random.default_rng(13)
    search = (rng.random((12000, 3)) * [20, 20, 5]).astype(np.float32)
    query = search[:2048]
    scaleset = [(0.4, (1.2, 0.6))]
    hi = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas"}))
    lo = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas", "precision": "bf16x2"}))
    assert (hi[:, 0] == lo[:, 0]).all()          # populations, scale 1
    assert (hi[:, 4] == lo[:, 4]).all()          # populations, scale 2
    assert np.abs(hi - lo).max() < 2e-3, np.abs(hi - lo).max()


def test_packed_backend_matches_span_backend():
    # the dense packed-candidate kernel against the span-DMA kernel:
    # identical span plan, so identical neighbor sets; features agree
    # to f32 accumulation-order tolerance and populations exactly
    from nimrud_tpu.features.multiscale import extract_scaleset
    rng = np.random.default_rng(21)
    search = (rng.random((20000, 3)) * [20, 20, 5]).astype(np.float32)
    query = search[:4096]
    scaleset = [(0.4, (1.2, 0.6))]
    spans = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "pallas"}))
    packed = np.asarray(extract_scaleset(
        query, search, scaleset, kind="minimal", method="fused",
        tuning={"backend": "packed"}))
    assert packed.shape == spans.shape
    assert np.array_equal(packed[:, 0], spans[:, 0])     # populations
    assert np.array_equal(packed[:, 4], spans[:, 4])
    assert np.allclose(packed, spans, atol=1e-3), \
        np.abs(packed - spans).max()


def test_packed_candidate_overflow_is_counted():
    # a c_cap below the measured per-entry candidate maximum must
    # surface in the dropped_candidates stat, never silently
    import jax
    from nimrud_tpu.ops import device_grid, packing, unique
    rng = np.random.default_rng(22)
    pts = (rng.random((4000, 3)) * 6).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    spec = device_grid.make_spec(
        lo, hi, 0.8, n_query=4096, voxel_edge=0.2, q_cap=64, x_seg=4)
    vox = packing.GridSpec.fit_bounds(lo, hi, 0.2)
    q = jnp.asarray(np.vstack([pts, np.zeros((96, 3), np.float32)]))
    qv = jnp.arange(4096) < 4000
    centers, _, mask = unique.unique_voxels(q, vox, valid=qv)
    cap = device_grid.packed_cap(q, qv, centers, mask, spec, margin=1.0)
    interp = jax.default_backend() not in ("tpu", "axon")
    _, full = device_grid.fused_extract_packed(
        q, qv, centers, mask, spec, (0.8,), "minimal", None, 4096,
        cap, interpret=interp, with_stats=True)
    assert int(full["dropped_candidates"]) == 0
    tight, st = device_grid.fused_extract_packed(
        q, qv, centers, mask, spec, (0.8,), "minimal", None, 4096,
        128, interpret=interp, with_stats=True)
    assert int(st["dropped_candidates"]) > 0
    assert tight.shape == (4096, 4)


def test_packed_split_caps_match_single_cap():
    # multi-bucket (caps, bounds) capacities from
    # span_host.candidate_caps_split gather exactly the same candidate
    # rows per entry as one max-sized cap (the bucket argsort is
    # un-permuted before the layouts), so the multi-band features must
    # be BIT-identical when nothing is dropped
    import jax
    from nimrud_tpu.features.multiscale import _host_unique_voxels
    from nimrud_tpu.ops import device_grid, packing, span_host, unique
    rng = np.random.default_rng(33)
    sparse = (rng.random((3000, 3)) * [12, 12, 3]).astype(np.float32)
    dense = rng.normal([6, 6, 1.5], 0.12, (3000, 3)).astype(np.float32)
    pts = np.vstack([sparse, dense]).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    edge, radius = 0.2, 0.8
    spec = device_grid.make_spec(lo, hi, radius, n_query=8192,
                                 voxel_edge=edge, q_cap=64, x_seg=4)
    vox = packing.GridSpec.fit_bounds(lo, hi, edge)
    q = jnp.asarray(np.vstack([pts, np.zeros((8192 - 6000, 3),
                                             np.float32)]))
    qv = jnp.arange(8192) < 6000
    centers, _, mask = unique.unique_voxels(q, vox, valid=qv)

    host_centers = _host_unique_voxels(pts, edge)
    split = span_host.candidate_caps_split(pts, host_centers, spec)
    assert isinstance(split, tuple), split         # the cluster splits
    single = span_host.candidate_cap(pts, host_centers, spec)

    interp = jax.default_backend() not in ("tpu", "axon")
    kw = dict(interpret=interp, with_stats=True)
    f_split, st_split = device_grid.fused_extract_packed_multi(
        q, qv, (centers,), (mask,), spec, (spec,), ((radius, 0.4),),
        "minimal", None, 6000, (split,), **kw)
    f_one, st_one = device_grid.fused_extract_packed_multi(
        q, qv, (centers,), (mask,), spec, (spec,), ((radius, 0.4),),
        "minimal", None, 6000, (single,), **kw)
    assert int(st_split["dropped_candidates"]) == 0
    assert int(st_one["dropped_candidates"]) == 0
    np.testing.assert_array_equal(np.asarray(f_split), np.asarray(f_one))


def test_packed_presorted_search_matches_sorted():
    # unique_voxels(tile_spec=...) orders its compaction sort by the
    # band's fine tile id, and _band_spans(presorted=True) skips its
    # own search sort.  Both sorts are stable over a key-sorted input,
    # so intra-tile candidate order -- and every feature SUM -- must be
    # BIT-identical to the default (key-sorted centers + in-band sort)
    # path.
    import jax
    from nimrud_tpu.ops import device_grid, packing, span_host, unique
    from nimrud_tpu.features.multiscale import _host_unique_voxels
    rng = np.random.default_rng(35)
    sparse = (rng.random((3000, 3)) * [12, 12, 3]).astype(np.float32)
    dense = rng.normal([6, 6, 1.5], 0.12, (3000, 3)).astype(np.float32)
    pts = np.vstack([sparse, dense]).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    edge, radius = 0.2, 0.8
    spec = device_grid.make_spec(lo, hi, radius, n_query=8192,
                                 voxel_edge=edge, q_cap=64, x_seg=4)
    vox = packing.GridSpec.fit_bounds(lo, hi, edge)
    q = jnp.asarray(np.vstack([pts, np.zeros((8192 - 6000, 3),
                                             np.float32)]))
    qv = jnp.arange(8192) < 6000
    c_key, n_key, m_key = unique.unique_voxels(q, vox, valid=qv)
    c_tile, n_tile, m_tile = unique.unique_voxels(
        q, vox, valid=qv, tile_spec=spec)
    assert int(n_key) == int(n_tile)
    # same survivor SET (row order differs), dead rows still last
    k = int(n_key)
    assert bool(m_tile[:k].all()) and not bool(m_tile[k:].any())
    np.testing.assert_array_equal(
        np.unique(np.asarray(c_key)[:k], axis=0),
        np.unique(np.asarray(c_tile)[:k], axis=0))

    host_centers = _host_unique_voxels(pts, edge)
    cap = span_host.candidate_cap(pts, host_centers, spec)
    interp = jax.default_backend() not in ("tpu", "axon")
    kw = dict(interpret=interp, with_stats=True)
    f_sorted, st_a = device_grid.fused_extract_packed_multi(
        q, qv, (c_key,), (m_key,), spec, (spec,), ((radius, 0.4),),
        "minimal", None, 6000, (cap,), **kw)
    f_pre, st_b = device_grid.fused_extract_packed_multi(
        q, qv, (c_tile,), (m_tile,), spec, (spec,), ((radius, 0.4),),
        "minimal", None, 6000, (cap,), presorted=True, **kw)
    assert int(st_a["dropped_candidates"]) == 0
    assert int(st_b["dropped_candidates"]) == 0
    np.testing.assert_array_equal(np.asarray(f_pre), np.asarray(f_sorted))


def _dot_reduce(w, feats):
    # stand-in for the serving classifier reduce: one matmul, tuple out
    return (feats @ w,)


def test_packed_entry_chunked_matches_unchunked():
    # entry_chunk runs the per-entry pipeline (pack + gather + kernel +
    # layout + reduce) under lax.map in bounded chunks; the reduced
    # rows each query's plan position points at must be bit-identical
    # to the un-chunked program
    import jax
    from nimrud_tpu.features.multiscale import _host_unique_voxels
    from nimrud_tpu.features.layouts import LAYOUT_WIDTHS
    from nimrud_tpu.ops import device_grid, packing, span_host, unique
    rng = np.random.default_rng(34)
    pts = (rng.random((6000, 3)) * [12, 12, 3]).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    edge, radii = 0.25, (0.8, 0.4)
    spec = device_grid.make_spec(lo, hi, max(radii), n_query=8192,
                                 voxel_edge=edge, q_cap=64, x_seg=4)
    vox = packing.GridSpec.fit_bounds(lo, hi, edge)
    q = jnp.asarray(np.vstack([pts, np.zeros((8192 - 6000, 3),
                                             np.float32)]))
    qv = jnp.arange(8192) < 6000
    centers, _, mask = unique.unique_voxels(q, vox, valid=qv)
    host_centers = _host_unique_voxels(pts, edge)
    cap = span_host.candidate_cap(pts, host_centers, spec)

    width = LAYOUT_WIDTHS["minimal"] * len(radii)
    w = jnp.asarray(rng.standard_normal((width, 3)).astype(np.float32))
    interp = jax.default_backend() not in ("tpu", "axon")
    kw = dict(interpret=interp, with_stats=True, order="plan",
              reduce_fn=_dot_reduce, reduce_args=w)
    args = (q, qv, (centers,), (mask,), spec, (spec,), (radii,),
            "minimal", None, 6000, (cap,))
    (flat_a, pos_a), st_a = device_grid.fused_extract_packed_multi(
        *args, **kw)
    # 3 chunks with a ragged tail (e_cap 256 -> 96+96+64-pad)
    (flat_b, pos_b), st_b = device_grid.fused_extract_packed_multi(
        *args, entry_chunk=96, **kw)
    assert int(st_a["dropped_candidates"]) == 0
    assert int(st_b["dropped_candidates"]) == 0
    a = np.asarray(flat_a[0])[np.asarray(pos_a)]
    b = np.asarray(flat_b[0])[np.asarray(pos_b)]
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_packed_sazo_matches_xla():
    # the packed kernel computes SAZO natively (masked max/min dz in
    # slab rows 10/11); the statistic itself is exact arithmetic, so it
    # must agree with the XLA path bit for bit wherever populations do
    # (slow: two full fused compiles, ~143 s on this host; the fast
    # op-level twin is test_packed_moments_sazo_and_chebyshev_op_level)
    from nimrud_tpu.features.multiscale import extract_scaleset
    rng = np.random.default_rng(31)
    search = (rng.random((12000, 3)) * [20, 20, 5]).astype(np.float32)
    query = search[:2048]
    scaleset = [(0.4, (1.2, 0.6))]
    xla = np.asarray(extract_scaleset(
        query, search, scaleset, kind="sazo", method="fused"))
    packed = np.asarray(extract_scaleset(
        query, search, scaleset, kind="sazo", method="fused",
        tuning={"backend": "packed"}))
    assert packed.shape == xla.shape
    pop = (packed[:, 0] == xla[:, 0]) & (packed[:, 5] == xla[:, 5])
    assert pop.mean() > 0.999
    # sazo columns (block layout: [density, centroid, eig1, eig2, sazo])
    assert np.array_equal(packed[pop][:, 4], xla[pop][:, 4])
    assert np.array_equal(packed[pop][:, 9], xla[pop][:, 9])
    assert np.allclose(packed[pop], xla[pop], atol=1e-3)


def test_rank_order_unsort_matches_plan_order():
    # order="rank" (monotone gather + one key-value sort) must produce
    # the same caller-order results as order="plan" (position scatter +
    # random gather) -- the serving label path runs "rank"
    import jax
    from nimrud_tpu.features.multiscale import _host_unique_voxels
    from nimrud_tpu.features.layouts import LAYOUT_WIDTHS
    from nimrud_tpu.ops import device_grid, packing, span_host, unique
    rng = np.random.default_rng(45)
    pts = (rng.random((5000, 3)) * [10, 10, 3]).astype(np.float32)
    lo, hi = pts.min(0), pts.max(0)
    edge, radii = 0.25, (0.8,)
    spec = device_grid.make_spec(lo, hi, max(radii), n_query=8192,
                                 voxel_edge=edge, q_cap=64, x_seg=4)
    vox = packing.GridSpec.fit_bounds(lo, hi, edge)
    q = jnp.asarray(np.vstack([pts, np.zeros((8192 - 5000, 3),
                                             np.float32)]))
    qv = jnp.arange(8192) < 5000
    centers, _, mask = unique.unique_voxels(q, vox, valid=qv)
    host_centers = _host_unique_voxels(pts, edge)
    cap = span_host.candidate_cap(pts, host_centers, spec)
    width = LAYOUT_WIDTHS["minimal"] * len(radii)
    w = jnp.asarray(rng.standard_normal((width, 3)).astype(np.float32))
    interp = jax.default_backend() not in ("tpu", "axon")
    args = (q, qv, (centers,), (mask,), spec, (spec,), (radii,),
            "minimal", None, 5000, (cap,))
    for entry_chunk in (None, 96):
        kw = dict(interpret=interp, with_stats=True,
                  reduce_fn=_dot_reduce, reduce_args=w,
                  entry_chunk=entry_chunk)
        (fl_p, pos_p), _ = device_grid.fused_extract_packed_multi(
            *args, order="plan", **kw)
        (out_r, q_order), _ = \
            device_grid.fused_extract_packed_multi(
                *args, order="rank", **kw)
        a = np.asarray(fl_p[0])[np.asarray(pos_p)]
        vals_r = out_r[0]                        # (n, 3) 2-D payload,
        parts = jax.lax.sort(                    # already rank-ordered:
            (q_order,) + tuple(vals_r[:, i]      # one column per lane,
                               for i in range(vals_r.shape[1])),
            num_keys=1)                          # as the proba path does
        b = np.stack([np.asarray(p) for p in parts[1:]], axis=1)
        np.testing.assert_array_equal(a, b[:5000])


def test_scan_pack_plan_matches_host_mirror():
    # the scatter-free _pack_plan (head flags + scans + one compaction
    # sort) must reproduce the host mirror's entry table exactly --
    # counts for every slot, geometry for live slots -- across segment
    # shapes, clustering, invalid rows, and e_cap > n_query
    import jax

    from nimrud_tpu.ops import device_grid, span_host

    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(50, 3000))
        q_cap = int(rng.choice([8, 32, 128]))
        m = int(rng.choice([1, 2, 3]))
        x_seg = int(rng.choice([1, 2, 8, 32]))
        span = rng.random(3) * 20 + 0.5
        pts = (rng.random((n, 3)) * span).astype(np.float32)
        if trial % 3 == 0:
            pts[: n // 2] = (rng.normal(span / 2, 0.3, (n // 2, 3))
                             ).astype(np.float32)
        valid = rng.random(n) > (0.5 if trial % 4 == 0 else 0.05)
        spec = device_grid.make_spec(
            pts.min(0) - 1e-3, pts.max(0) + 1e-3,
            float(rng.random() * 2 + 0.3), n_query=n,
            m=m, q_cap=q_cap, s_cap=64, x_seg=x_seg)
        plan = jax.jit(
            lambda q, v, s=spec: device_grid._pack_plan(q, v, s))(
            jnp.asarray(pts), jnp.asarray(valid))
        h = span_host.pack_plan_np(pts, valid, spec)
        hc = np.asarray(h["count"])
        live = hc > 0
        np.testing.assert_array_equal(
            np.asarray(plan["count"])[:hc.shape[0]], hc,
            err_msg=f"trial {trial} count")
        for k in ("tx_lo", "tx_hi", "ty", "tz"):
            got = np.asarray(plan[k])[:hc.shape[0]]
            np.testing.assert_array_equal(
                got[live], np.asarray(h[k])[live],
                err_msg=f"trial {trial} {k}")
    # all-invalid cloud: zero coverage, no NaNs in centers
    dead = jax.jit(
        lambda q, v, s=spec: device_grid._pack_plan(q, v, s))(
        jnp.asarray(pts), jnp.zeros(n, bool))
    assert int(np.asarray(dead["count"]).sum()) == 0
    assert np.isfinite(np.asarray(dead["centers"])).all()


def test_packed_moments_sazo_and_chebyshev_op_level():
    # fast op-level twin of the full-pipeline sazo test (which is
    # compile-heavy and runs under -m slow): the packed kernel's sazo
    # rows (masked max/min signed z offset, slab rows 10/11) and the
    # round-5 chebyshev metric (the packed-interp mask) against a
    # float64 oracle on tiny packed blocks
    from nimrud_tpu.ops.pallas import packed_kernel as pkk

    n_e, q_cap, c_cap = 4, 16, 128
    q_t = (RNG.random((n_e, 3, q_cap)) * 2 - 1).astype(np.float32)
    cand = (RNG.random((3, n_e * c_cap)) * 2 - 1).astype(np.float32)
    centers = (RNG.random((n_e, 3)) * 0.5).astype(np.float32)
    radius = 0.8

    slabs = np.asarray(pkk.packed_moments(
        jnp.asarray(q_t), jnp.asarray(cand), jnp.asarray(centers),
        (radius,), interpret=True, with_sazo=True))
    cheb = np.asarray(pkk.packed_moments(
        jnp.asarray(q_t), jnp.asarray(cand), jnp.asarray(centers),
        (radius,), interpret=True, metric="chebyshev"))

    for e in range(n_e):
        ce = centers[e]
        s_local = cand[:, e * c_cap:(e + 1) * c_cap].T - ce  # (c, 3)
        q_local = q_t[e].T - ce                              # (q, 3)
        for qi in range(q_cap):
            d = s_local - q_local[qi]
            mask_e = (d ** 2).sum(1) <= radius * radius
            mask_c = np.abs(d).max(1) <= np.float32(radius)
            # counts (slab row 0) exact under both metrics
            assert slabs[e, qi, 0] == mask_e.sum(), (e, qi)
            assert cheb[e, qi, 0] == mask_c.sum(), (e, qi)
            # sazo rows: masked max/min of the signed z offset s - q
            dz = d[:, 2]
            if mask_e.any():
                assert np.isclose(slabs[e, qi, 10], dz[mask_e].max(),
                                  atol=1e-6)
                assert np.isclose(slabs[e, qi, 11], dz[mask_e].min(),
                                  atol=1e-6)
    # chebyshev rejects sazo and exclude_radius loudly
    with pytest.raises(ValueError):
        pkk.packed_moments(
            jnp.asarray(q_t), jnp.asarray(cand), jnp.asarray(centers),
            (radius,), interpret=True, metric="chebyshev",
            with_sazo=True)
