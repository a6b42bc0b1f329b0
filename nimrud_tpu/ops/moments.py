"""
Masked multiscale moment accumulation -- the compute core of the framework.

Design (TPU-first): instead of gathering per-point neighbor lists (the
reference's neighborhood tensor + stream compaction, reference:
nimrud/prototypes/ch.py:969-1570), every per-neighborhood statistic the
feature layouts need is a **matmul**:

    d2   = |q|^2 + |s|^2 - 2 q s^T          (MXU, query-chunk x search)
    M_r  = (d2 <= r^2) as f32                (VPU mask per scale)
    mom  = M_r @ [1, s, s (x) s]             (MXU, moments about the chunk
                                              center: count, first, second)

One distance matrix serves every radius of a scale band (the reference's
descending-scale reuse, reference: nimrud/prototypes/mso.py:472-548), and
the neighborhood never materializes.  Each query chunk is recentered on its
own midpoint before any squaring so fp32 never sees large absolute
coordinates (the chunked driver assumes spatially coherent chunks, which
the callers arrange by voxel-key sorting).

Output statistics are frame-independent: count, neighborhood mean (global
frame), and the *central* second-moment matrix (packed 6-vector), from
which every feature layout (minimal / geometric / oriented / covariance /
vector) derives.
"""

import functools

import jax
import jax.numpy as jnp


def _augment(points, attributes=None):
    """[1, x, y, z, xx, xy, xz, yy, yz, zz] (+ attribute columns)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    columns = [jnp.ones_like(x), x, y, z,
               x * x, x * y, x * z, y * y, y * z, z * z]
    aug = jnp.stack(columns, axis=1)
    if attributes is not None:
        aug = jnp.concatenate([aug, attributes], axis=1)
    return aug


def chunk_moments(query_chunk, search, search_valid, radii,
                  attributes=None, exclude_radius=None,
                  metric="euclidean", with_sazo=False):
    """
    Moments of every search neighborhood of one query chunk, per radius.

    Args:
      query_chunk:  (Q, 3) float32.
      search:       (S, 3) float32 (padded rows allowed).
      search_valid: (S,) bool.
      radii:        tuple of floats, the scale band (any order).
      attributes:   optional (S, A) float32 per-search-point attribute
                    vectors (for vector/attribute-mean features).
      exclude_radius: if set, search points strictly closer than this to
                    the query are excluded (legacy G_MSO self-exclusion,
                    reference: nimrud/prototypes/ch.py:1054-1055).
      metric:       "euclidean" (matmul distance) or "chebyshev" (per-axis
                    broadcast compare, used for attribute interpolation
                    onto voxel centers; reference supports both in
                    nimrud/prototypes/ch.py:208-252).
      with_sazo:    also compute the signed max Z offset -- the signed
                    z-displacement of the neighborhood point farthest
                    from the query in z (masked max reduction; realizes
                    the reference's SAZO stub, reference:
                    nimrud/prototypes/mso.py:690).

    Returns:
      dict of arrays, each (Q, n_radii, ...):
        count:  (Q, R)      neighbors per radius
        mean:   (Q, R, 3)   neighborhood mean, global frame
        cov:    (Q, R, 6)   central second moment (scatter/count), packed
        attr_mean: (Q, R, A) masked attribute means (if attributes given)
        sazo:   (Q, R)      signed max z offset (if with_sazo)
    """
    # recenter on the chunk midpoint for the MOMENT sums only: all
    # squared terms stay O(chunk span)
    center = (jnp.max(query_chunk, axis=0) + jnp.min(query_chunk, axis=0)) \
        * 0.5
    s = search - center

    # DISTANCES (and sazo offsets) come from the RAW global coordinates:
    # a single f32 subtraction of nearby values is exact (Sterbenz) and,
    # crucially, PARTITION-INVARIANT -- the same (query, search) pair
    # gets bit-identical d2 no matter which chunk, shard, or halo group
    # it appears in, so ball membership (the counts) is deterministic
    # across the dense, mesh, and chunked paths.  The old chunk-frame
    # diff ((q-c)-(s-c)) rounded differently per chunk and flipped
    # shell points between the single-chip and multi-chip programs.
    if metric == "euclidean":
        # elementwise on the VPU: per-axis squared differences have no
        # cancellation (better than the |q|^2+|s|^2-2qs expansion) and
        # a K=3 matmul would waste >95% of the MXU anyway
        d2 = 0.0
        for axis in range(3):
            diff = query_chunk[:, None, axis] - search[None, :, axis]
            d2 = d2 + diff * diff
    elif metric == "chebyshev":
        cheby = jnp.max(
            jnp.abs(query_chunk[:, None, :] - search[None, :, :]),
            axis=-1)
        d2 = cheby * cheby
    else:
        raise ValueError(f"unknown metric {metric!r}")

    base = search_valid[None, :]
    if exclude_radius is not None:
        base = base & (d2 >= exclude_radius * exclude_radius)

    aug = _augment(s, attributes)
    n_attr = 0 if attributes is None else attributes.shape[1]
    if with_sazo:
        dz = search[None, :, 2] - query_chunk[:, None, 2]   # frame-free
        big = jnp.float32(1e30)

    counts, means, covs, attr_means, sazos = [], [], [], [], []
    for radius in radii:
        in_ball = base & (d2 <= radius * radius)
        mask = in_ball.astype(jnp.float32)
        # transposed MXU orientation (see ops.grid._entry_stats): the
        # ~10 moment columns stream while S (contraction) and Q
        # (output) tile fully.  Precision.HIGHEST: the MXU truncates
        # f32 operands to bf16 by default, losing ~3 digits of the
        # second moments; HIGHEST keeps f32-faithful results
        # (multi-pass on the MXU); no-op on CPU.
        mom = jnp.einsum("sk,qs->qk", aug, mask,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        count = mom[:, 0]
        denom = jnp.maximum(count, 1.0)
        mean_local = mom[:, 1:4] / denom[:, None]
        raw_second = mom[:, 4:10] / denom[:, None]
        mx, my, mz = mean_local[:, 0], mean_local[:, 1], mean_local[:, 2]
        outer = jnp.stack(
            [mx * mx, mx * my, mx * mz, my * my, my * mz, mz * mz], axis=1)
        counts.append(count)
        means.append(mean_local + center)
        covs.append(raw_second - outer)
        if n_attr:
            attr_means.append(mom[:, 10:] / denom[:, None])
        if with_sazo:
            mx = jnp.max(jnp.where(in_ball, dz, -big), axis=1)
            mn = jnp.min(jnp.where(in_ball, dz, big), axis=1)
            sazos.append(jnp.where(
                count > 0, jnp.where(mx >= -mn, mx, mn), 0.0))

    out = {
        "count": jnp.stack(counts, axis=1),
        "mean": jnp.stack(means, axis=1),
        "cov": jnp.stack(covs, axis=1),
    }
    if n_attr:
        out["attr_mean"] = jnp.stack(attr_means, axis=1)
    if with_sazo:
        out["sazo"] = jnp.stack(sazos, axis=1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "chunk_size", "exclude_radius", "has_attr", "metric",
        "with_sazo"))
def _multiscale_moments_impl(query, search, search_valid, attributes,
                             radii, chunk_size, exclude_radius, has_attr,
                             metric, with_sazo=False):
    n_query = query.shape[0]
    n_chunks = n_query // chunk_size
    q_chunks = query.reshape(n_chunks, chunk_size, 3)
    attr = attributes if has_attr else None

    def body(q_chunk):
        return chunk_moments(
            q_chunk, search, search_valid, radii,
            attributes=attr, exclude_radius=exclude_radius, metric=metric,
            with_sazo=with_sazo)

    stacked = jax.lax.map(body, q_chunks)
    return {key: value.reshape((n_query,) + value.shape[2:])
            for key, value in stacked.items()}


def multiscale_moments(query, search, search_valid, radii, *,
                       attributes=None, chunk_size=256,
                       exclude_radius=None, metric="euclidean",
                       with_sazo=False):
    """
    Chunked driver over the whole query set (jit, static shapes).

    ``query`` rows must be a multiple of ``chunk_size`` (callers pad).
    Chunks should be spatially coherent (voxel-key sorted) for best fp32
    accuracy; correctness does not depend on it.
    """
    if query.shape[0] % chunk_size:
        raise ValueError(
            f"query rows ({query.shape[0]}) must be a multiple of "
            f"chunk_size ({chunk_size}); pad first")
    has_attr = attributes is not None
    if not has_attr:
        attributes = jnp.zeros((search.shape[0], 0), dtype=search.dtype)
    return _multiscale_moments_impl(
        query, search, search_valid, attributes,
        tuple(float(r) for r in radii), int(chunk_size),
        None if exclude_radius is None else float(exclude_radius),
        has_attr, metric, bool(with_sazo))
