"""
Tiled voxel-hash-grid path: must agree with the dense moment path exactly
(counts) / within f32 tolerance (moments), including at tile borders --
the halo-correctness cases the reference never tested (SURVEY.md section 7).
"""

import numpy as np
import jax.numpy as jnp

from nimrud_tpu.ops import grid, moments


RNG = np.random.default_rng(10)


def _dense(query, search, radii, **kw):
    s_bucket = 1 << int(np.ceil(np.log2(len(search))))
    padded = np.zeros((s_bucket, 3), np.float32)
    padded[:len(search)] = search
    valid = np.zeros(s_bucket, bool)
    valid[:len(search)] = True
    if kw.get("attributes") is not None:
        attrs = np.asarray(kw["attributes"], np.float32)
        attrs_padded = np.zeros((s_bucket, attrs.shape[1]), np.float32)
        attrs_padded[:len(search)] = attrs
        kw = dict(kw, attributes=jnp.asarray(attrs_padded))
    q_bucket = ((len(query) + 63) // 64) * 64
    q_padded = np.zeros((q_bucket, 3), np.float32)
    q_padded[:len(query)] = query
    got = moments.multiscale_moments(
        jnp.asarray(q_padded), jnp.asarray(padded), jnp.asarray(valid),
        radii, chunk_size=64, **kw)
    return {k: np.asarray(v)[:len(query)] for k, v in got.items()}


def _compare(query, search, radii, tile_edge, **kw):
    problem = grid.build_tiled_problem(query, search, tile_edge)
    tiled = grid.tiled_moments(problem, query, search, radii, **kw)
    dense = _dense(query, search, radii, **kw)

    # the two paths recenter fp32 arithmetic differently, so a pair lying
    # within ~1e-6 of a radius boundary may legitimately flip; a real halo
    # bug drops whole tiles (tens of neighbors), which this still catches
    diff = tiled["count"] - dense["count"]
    assert np.abs(diff).max() <= 1, \
        f"count mismatch up to {np.abs(diff).max()} neighbors"
    assert (diff != 0).mean() < 0.01, \
        f"{(diff != 0).sum()} of {diff.size} counts flipped"
    have = (dense["count"] > 0) & (diff == 0)
    assert np.allclose(tiled["mean"][have], dense["mean"][have], atol=5e-5)
    assert np.allclose(tiled["cov"][have], dense["cov"][have], atol=5e-5)
    if "attr_mean" in dense:
        assert np.allclose(
            tiled["attr_mean"][have], dense["attr_mean"][have], atol=5e-5)
    return tiled


def test_tiled_matches_dense_random():
    query = (RNG.random((700, 3)) * 10).astype(np.float32)
    search = (RNG.random((3000, 3)) * 10).astype(np.float32)
    _compare(query, search, (1.0, 0.5), tile_edge=1.0)


def test_tiled_matches_dense_clustered():
    # very uneven occupancy: dense blob + sparse field
    blob = RNG.normal([2, 2, 2], 0.3, (2000, 3)).astype(np.float32)
    field = (RNG.random((500, 3)) * 12).astype(np.float32)
    search = np.vstack([blob, field])
    query = np.vstack([blob[:300], field[:200]])
    _compare(query, search, (0.8, 0.4), tile_edge=0.8)


def test_tiled_halo_straddle():
    # queries sitting exactly on tile faces, with neighbors on both sides
    tile_edge = 1.0
    base = np.asarray([[1.0, 0.5, 0.5], [2.0, 1.0, 1.0], [1.0, 1.0, 1.0]],
                      dtype=np.float32)
    offsets = RNG.normal(0, 0.45, (600, 3)).astype(np.float32)
    search = (base[RNG.integers(0, 3, 600)] + offsets).astype(np.float32)
    query = base
    tiled = _compare(query, search, (0.9,), tile_edge=tile_edge)
    assert tiled["count"].min() > 0


def test_tiled_query_outside_search_bounds():
    search = (RNG.random((500, 3)) * 4).astype(np.float32)
    query = np.vstack([
        search[:50] + [4.05, 0, 0],        # just outside, within radius
        search[:5] + [40, 0, 0],           # far outside: empty hoods
    ]).astype(np.float32)
    _compare(query, search, (0.5,), tile_edge=0.5)


def test_tiled_with_attributes_and_exclusion():
    pts = (RNG.random((1200, 3)) * 6).astype(np.float32)
    attrs = RNG.random((1200, 3)).astype(np.float32)
    _compare(pts[:400], pts, (0.7,), tile_edge=0.7,
             attributes=attrs, exclude_radius=1e-4)


def test_tiled_chebyshev_matches_bruteforce():
    # chebyshev masked attribute means through the tile grid (the
    # attribute-interpolation path for large clouds)
    search = (RNG.random((2500, 3)) * 6).astype(np.float32)
    attrs = RNG.random((2500, 2)).astype(np.float32)
    query = (RNG.random((300, 3)) * 6).astype(np.float32)
    edge = 0.5

    problem = grid.build_tiled_problem(query, search, edge)
    got = grid.tiled_moments(
        problem, query, search, (edge,), attributes=attrs,
        metric="chebyshev")

    for qi in range(0, len(query), 17):
        mask = np.max(np.abs(search.astype(np.float64)
                             - query[qi].astype(np.float64)), axis=1) \
            <= edge
        count = mask.sum()
        assert abs(got["count"][qi, 0] - count) <= 1
        if got["count"][qi, 0] == count and count > 0:
            assert np.allclose(
                got["attr_mean"][qi, 0], attrs[mask].mean(0), atol=5e-5)


def test_tiled_radius_exceeding_edge_rejected():
    pts = (RNG.random((100, 3)) * 4).astype(np.float32)
    problem = grid.build_tiled_problem(pts, pts, 0.5)
    try:
        grid.tiled_moments(problem, pts, pts, (1.0,))
    except ValueError:
        pass
    else:
        raise AssertionError("accepted radius > tile edge")
