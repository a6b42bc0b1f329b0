"""
Device voxel-attribute interpolation (ops.interp) against the host
voxel_downsample oracle (the reference's vec_field_interp semantics).
"""

import numpy as np
import jax.numpy as jnp

from nimrud_tpu.features.multiscale import voxel_downsample
from nimrud_tpu.ops import interp, packing


RNG = np.random.default_rng(21)
EDGE = 0.5


def _inputs(n=3000, n_attr=3):
    pts = (RNG.random((n, 3)) * 7).astype(np.float32)
    # keep points off voxel boundaries so f32/f64 binning agrees
    frac = (pts / EDGE) % 1.0
    ok = np.all((frac > 0.05) & (frac < 0.95), axis=1)
    pts = pts[ok]
    attrs = RNG.random((len(pts), n_attr)).astype(np.float32)
    return pts, attrs


def test_interp_matches_host_oracle():
    pts, attrs = _inputs()
    want_centers, want_attrs = voxel_downsample(pts, EDGE, attrs)

    bucket = 1
    while bucket < len(pts):
        bucket *= 2
    padded = np.zeros((bucket, 3), np.float32)
    padded[: len(pts)] = pts
    apad = np.zeros((bucket, attrs.shape[1]), np.float32)
    apad[: len(pts)] = attrs
    valid = np.arange(bucket) < len(pts)

    spec = packing.GridSpec.fit(pts, EDGE)
    centers, mask, got_attrs, stats = interp.interp_to_voxels(
        jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(apad),
        spec, 64, with_stats=True)
    mask = np.asarray(mask)
    centers = np.asarray(centers)[mask]
    got_attrs = np.asarray(got_attrs)[mask]
    assert int(stats["dropped_search"]) == 0
    assert len(centers) == len(want_centers)

    # both sides sort centers by voxel key; rows must correspond
    order_w = np.lexsort(want_centers.T)
    order_g = np.lexsort(centers.T)
    assert np.allclose(centers[order_g], want_centers[order_w], atol=1e-5)
    assert np.allclose(
        got_attrs[order_g], want_attrs[order_w], atol=2e-5), \
        np.abs(got_attrs[order_g] - want_attrs[order_w]).max()


def test_interp_overflow_counted():
    # all 600 points inside one voxel cell
    pts = (0.2 + RNG.random((600, 3)) * 0.05).astype(np.float32)
    bucket = 1024
    padded = np.zeros((bucket, 3), np.float32)
    padded[:600] = pts
    apad = np.zeros((bucket, 1), np.float32)
    apad[:600] = 1.0
    valid = np.arange(bucket) < 600
    spec = packing.GridSpec.fit(pts, EDGE)
    _, _, _, stats = interp.interp_to_voxels(
        jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(apad),
        spec, 64, with_stats=True)
    assert int(stats["dropped_search"]) == 600 - 64


def test_interp_matmul_matches_gather():
    # the wide-attribute matmul layout must agree with the span-gather
    # interp (and hence the host oracle) on identical inputs
    pts, attrs = _inputs(n=2500, n_attr=12)
    bucket = 1
    while bucket < len(pts):
        bucket *= 2
    padded = np.zeros((bucket, 3), np.float32)
    padded[: len(pts)] = pts
    apad = np.zeros((bucket, attrs.shape[1]), np.float32)
    apad[: len(pts)] = attrs
    valid = np.arange(bucket) < len(pts)

    spec = packing.GridSpec.fit(pts, EDGE)
    g_centers, g_mask, g_attrs = interp.interp_to_voxels(
        jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(apad),
        spec, 64)
    lo = pts.min(0).astype(np.float64)
    hi = pts.max(0).astype(np.float64)
    m_centers, m_mask, m_attrs, stats = interp.interp_to_voxels_matmul(
        jnp.asarray(padded), jnp.asarray(valid), jnp.asarray(apad),
        spec, 64, lo, hi, with_stats=True)
    assert int(stats["dropped_search"]) == 0
    assert np.array_equal(np.asarray(g_mask), np.asarray(m_mask))
    live = np.asarray(g_mask)
    assert np.allclose(np.asarray(g_centers)[live],
                       np.asarray(m_centers)[live], atol=1e-5)
    diff = np.abs(np.asarray(g_attrs)[live] - np.asarray(m_attrs)[live])
    assert diff.max() < 2e-5, diff.max()


def test_vector_fused_wide_attrs_auto_matmul():
    # kind="vector" with a wide attribute block routes through the
    # matmul interp automatically and matches the gather backend
    from nimrud_tpu.features.multiscale import extract_scaleset
    pts, attrs = _inputs(n=2000, n_attr=16)
    query = pts[:512]
    scaleset = [(EDGE, (2 * EDGE,))]
    auto = extract_scaleset(query, pts, scaleset, kind="vector",
                            attributes=attrs, method="fused")
    gather = extract_scaleset(query, pts, scaleset, kind="vector",
                              attributes=attrs, method="fused",
                              tuning={"interp_backend": "gather"})
    assert auto.shape == gather.shape == (512, 16)
    assert np.abs(auto - gather).max() < 5e-5


def test_packed_interp_matches_ball_oracle():
    # the packed-candidate interp (round-5: replaces the 27-span gather
    # interp on the packed backend -- that path measured 28 s/step at
    # 200k points on v5e and its 1M serving program crashed the TPU
    # worker): same centers/mask as the gather interp, exact masked
    # means against a float64 chebyshev-ball oracle on its own centers
    # (entry-local-frame boundary flips excepted -- knife-edge points
    # at EXACTLY ball distance may differ; the oracle tolerance counts
    # them)
    from nimrud_tpu.features import multiscale

    pts, attrs = _inputs(n=4000)
    attrs = np.concatenate([np.ones((len(pts), 1), np.float32), attrs],
                           axis=1)
    s_lo = pts.min(0).astype(np.float64)
    s_hi = pts.max(0).astype(np.float64)
    spec = packing.GridSpec.fit_bounds(s_lo, s_hi, EDGE)
    bucket = multiscale._pow2_bucket(len(pts))
    sd = jnp.asarray(multiscale._pad_rows_f32(pts, bucket))
    ad = jnp.asarray(multiscale._pad_rows_f32(attrs, bucket))
    sv = jnp.arange(bucket) < len(pts)

    ispec, icap = multiscale._interp_packed_plan(
        pts, spec, s_lo, s_hi, (s_lo, s_hi), 3)
    centers, mask, means, stats = interp.packed_interp(
        sd, sv, ad, spec, ispec, icap, with_stats=True)
    centers, mask, means = map(np.asarray, (centers, mask, means))
    assert int(stats["dropped_search"]) == 0

    # gather-interp agreement: same voxel set (same keys; center
    # coordinates may differ in the last ulp across programs)
    g_centers, g_mask, g_means = interp.interp_to_voxels(
        sd, sv, ad, spec, 64)
    assert np.array_equal(mask, np.asarray(g_mask))
    assert np.allclose(centers[mask], np.asarray(g_centers)[mask],
                       atol=1e-4)

    # exact masked means on the packed path's own centers
    live = np.where(mask)[0]
    bad = 0
    for i in live:
        sel = np.abs(pts - centers[i]).max(1) <= np.float32(EDGE)
        if not sel.any():
            continue
        want = attrs[sel].astype(np.float64).mean(0)
        if np.abs(means[i] - want).max() > 1e-4:
            bad += 1
    assert bad <= max(2, len(live) // 500), (bad, len(live))
    # ones column: masked mean of ones is exactly 1 on live centers
    assert np.array_equal(means[mask][:, 0],
                          np.ones(mask.sum(), np.float32))
    assert (means[~mask] == 0).all()


def test_packed_interp_split_caps_match_single_cap():
    # round-5 follow-up: the packed interp's per-entry candidate totals
    # against the RAW cloud are heavy-tailed, so _interp_packed_plan
    # sizes multi-bucket (caps, bounds) split capacities
    # (span_host.candidate_caps_split) instead of one max-sized cap.
    # Each entry's packed block holds the same candidate rows in the
    # same slots whichever bucket it lands in (and whatever entry batch
    # the bucket unrolls), so the means must be BIT-identical to the
    # single-cap path when nothing is dropped.
    from nimrud_tpu.features import multiscale
    from nimrud_tpu.ops import span_host

    # heavy tail: a dense cluster inside a sparse field
    sparse = (RNG.random((2500, 3)) * [10, 10, 3]).astype(np.float32)
    dense = RNG.normal([5, 5, 1.5], 0.1, (2500, 3)).astype(np.float32)
    pts = np.vstack([sparse, dense]).astype(np.float32)
    frac = (pts / EDGE) % 1.0
    pts = pts[np.all((frac > 0.02) & (frac < 0.98), axis=1)]
    attrs = RNG.random((len(pts), 2)).astype(np.float32)
    s_lo = pts.min(0).astype(np.float64)
    s_hi = pts.max(0).astype(np.float64)
    spec = packing.GridSpec.fit_bounds(s_lo, s_hi, EDGE)
    bucket = multiscale._pow2_bucket(len(pts))
    sd = jnp.asarray(multiscale._pad_rows_f32(pts, bucket))
    ad = jnp.asarray(multiscale._pad_rows_f32(attrs, bucket))
    sv = jnp.arange(bucket) < len(pts)

    ispec, icap = multiscale._interp_packed_plan(
        pts, spec, s_lo, s_hi, (s_lo, s_hi), 3)
    assert isinstance(icap, tuple), icap         # the cluster splits
    caps, bounds = icap
    assert len(caps) == len(bounds) + 1
    single = span_host.candidate_cap(
        multiscale._host_unique_voxels(pts, EDGE, bounds=(s_lo, s_hi)),
        pts, ispec)

    c_split, m_split, a_split, st_split = interp.packed_interp(
        sd, sv, ad, spec, ispec, icap, with_stats=True)
    c_one, m_one, a_one, st_one = interp.packed_interp(
        sd, sv, ad, spec, ispec, single, with_stats=True)
    assert int(st_split["dropped_search"]) == 0
    assert int(st_one["dropped_search"]) == 0
    np.testing.assert_array_equal(np.asarray(m_split), np.asarray(m_one))
    np.testing.assert_array_equal(np.asarray(c_split), np.asarray(c_one))
    np.testing.assert_array_equal(np.asarray(a_split), np.asarray(a_one))
