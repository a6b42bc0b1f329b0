"""
Feature layouts: turn neighborhood moments into per-scale feature blocks.

Each function maps the frame-independent statistics from
:mod:`nimrud_tpu.ops.moments` (count, mean, central second moment) to one
of the reference's multiscale-operator output layouts.  All run under jit
on device (pure jnp), all define degenerate neighborhoods as zeros.

Layouts (columns per scale):
  minimal     [population, centroid, eig1, eig2]
              (reference: nimrud/minimal/features.py, multiscale.py:70-123;
              eig1 >= eig2 are the two largest eigenvalues of the
              neighborhood covariance normalized to sum 1)
  geometric   [density, centroid, eig1, eig2]   (G_MSO,
              reference: nimrud/prototypes/mso.py:472-548; density =
              count / sphere volume in cm^3)
  oriented    [density, centroid, eig_s0, eig_s1, v0x, v0y, v1x, v1y]
              (OG_MSO, reference: nimrud/prototypes/mso.py:1428-1548;
              eig_s0 <= eig_s1 are the two *smallest* normalized
              eigenvalues -- the reference's ascending eigh + argsort[:, :2]
              keeps the smallest pair -- and v0/v1 are the first two
              components of their eigenvectors, signs arbitrary)
  covariance  [density, centroid, sxx, sxy, sxz, syy, syz, szz]
              (C_MSO, reference: nimrud/prototypes/mso.py:1667-1755; the
              scatter matrix Sum (p-c)(p-c)^T upper triangle.  The
              reference wrote it at the wrong column offset, overwriting
              the centroid -- fixed here per SURVEY.md section 2c)
  vector      [attr_mean x A]                   (V_MSO,
              reference: nimrud/prototypes/mso.py:12-173)
"""

import jax.numpy as jnp

from nimrud_tpu.ops.eigen import eigh3, eigvalsh3

# one million cubic centimeters per cubic meter: the reference reports
# densities in points per cm^3 (reference: nimrud/prototypes/mso.py:488)
CM3_PER_M3 = 1.0e6

LAYOUT_WIDTHS = {
    "minimal": 4,
    "geometric": 4,
    "oriented": 8,
    "covariance": 8,
    "eigen": 10,
    "sazo": 5,
}


def needs_sazo(kind):
    """Whether this layout requires the signed-max-z-offset statistic."""
    return kind == "sazo"


def _centroid_displacement(count, mean, query):
    """|query - neighborhood mean|; zero for empty neighborhoods."""
    delta = mean - query
    norm = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    return jnp.where(count > 0, norm, 0.0)


def _normalized_eigs(count, cov):
    """
    Eigenvalues of the central second moment normalized to sum to one,
    descending.  Zeros when the neighborhood has fewer than two points or
    zero total variance (the reference's undefined-feature contract).
    """
    vals = eigvalsh3(cov)
    trace = cov[..., 0] + cov[..., 3] + cov[..., 5]
    ok = (count >= 2) & (trace > 0)
    safe = jnp.where(trace > 0, trace, 1.0)
    return jnp.where(ok[..., None], vals / safe[..., None], 0.0)


def sphere_density(count, radius):
    """Points per cubic centimeter of the spherical neighborhood."""
    volume = CM3_PER_M3 * (4.0 / 3.0) * jnp.pi * radius ** 3
    return count / volume


def minimal_block(count, mean, cov, query):
    """(N,) (N,3) (N,6) (N,3) -> (N, 4) [population, centroid, eig1, eig2]."""
    eigs = _normalized_eigs(count, cov)
    return jnp.stack([
        count,
        _centroid_displacement(count, mean, query),
        eigs[..., 0],
        eigs[..., 1],
    ], axis=-1)


def geometric_block(count, mean, cov, query, radius):
    """G_MSO: [density, centroid, eig1, eig2]."""
    eigs = _normalized_eigs(count, cov)
    return jnp.stack([
        sphere_density(count, radius),
        _centroid_displacement(count, mean, query),
        eigs[..., 0],
        eigs[..., 1],
    ], axis=-1)


def oriented_block(count, mean, cov, query, radius):
    """
    OG_MSO: [density, centroid, smallest two normalized eigenvalues
    (ascending), xy components of their eigenvectors].
    """
    vals, vecs = eigh3(cov)                     # descending
    trace = cov[..., 0] + cov[..., 3] + cov[..., 5]
    ok = (count >= 2) & (trace > 0)
    safe = jnp.where(trace > 0, trace, 1.0)
    norm_vals = jnp.where(ok[..., None], vals / safe[..., None], 0.0)
    vec_ok = jnp.where(ok[..., None, None], vecs, 0.0)
    return jnp.stack([
        sphere_density(count, radius),
        _centroid_displacement(count, mean, query),
        norm_vals[..., 2],                      # smallest
        norm_vals[..., 1],                      # middle
        vec_ok[..., 2, 0], vec_ok[..., 2, 1],   # smallest eigvec x, y
        vec_ok[..., 1, 0], vec_ok[..., 1, 1],   # middle eigvec x, y
    ], axis=-1)


def eigen_block(count, mean, cov, query, radius):
    """
    The full eigenvalue geometry feature set of the point-cloud
    literature (Weinmann et al. style), from the neighborhood covariance
    eigenvalues l1 >= l2 >= l3 (unnormalized):

      [density, centroid, linearity, planarity, scattering,
       omnivariance, anisotropy, eigenentropy, curvature, verticality?]

    columns (10): density, centroid, linearity (l1-l2)/l1, planarity
    (l2-l3)/l1, scattering l3/l1, omnivariance (l1*l2*l3)^(1/3) /
    sum(l), anisotropy (l1-l3)/l1, eigenentropy -sum(p*log p) over
    normalized p, sum-of-eigenvalues (trace), curvature l3/trace.
    Undefined (count < 2 or zero variance) rows are zeros.
    """
    vals = eigvalsh3(cov)
    l1, l2, l3 = vals[..., 0], vals[..., 1], vals[..., 2]
    trace = cov[..., 0] + cov[..., 3] + cov[..., 5]
    ok = (count >= 2) & (trace > 0) & (l1 > 0)
    safe_l1 = jnp.where(l1 > 0, l1, 1.0)
    safe_trace = jnp.where(trace > 0, trace, 1.0)

    p = jnp.clip(vals / safe_trace[..., None], 1e-12, 1.0)
    eigenentropy = -jnp.sum(p * jnp.log(p), axis=-1)
    omnivariance = jnp.cbrt(
        jnp.clip(l1 * l2 * l3, 0.0, None)) / safe_trace

    def gate(value):
        return jnp.where(ok, value, 0.0)

    return jnp.stack([
        sphere_density(count, radius),
        _centroid_displacement(count, mean, query),
        gate((l1 - l2) / safe_l1),            # linearity
        gate((l2 - l3) / safe_l1),            # planarity
        gate(l3 / safe_l1),                   # scattering
        gate(omnivariance),
        gate((l1 - l3) / safe_l1),            # anisotropy
        gate(eigenentropy),
        gate(trace),                          # sum of eigenvalues
        gate(l3 / safe_trace),                # change of curvature
    ], axis=-1)


def covariance_block(count, mean, cov, query, radius):
    """C_MSO: [density, centroid, scatter-matrix upper triangle]."""
    scatter = cov * count[..., None]
    return jnp.concatenate([
        jnp.stack([
            sphere_density(count, radius),
            _centroid_displacement(count, mean, query),
        ], axis=-1),
        scatter,
    ], axis=-1)


def sazo_block(count, mean, cov, query, radius, sazo):
    """
    G_MSO augmented with the signed max Z offset: [density, centroid,
    eig1, eig2, sazo].  Realizes the reference's SAZO stub (reference:
    nimrud/prototypes/mso.py:690) -- the signed z-displacement of the
    neighborhood point farthest from the query in z; zero for empty
    neighborhoods.
    """
    return jnp.concatenate([
        geometric_block(count, mean, cov, query, radius),
        sazo[..., None],
    ], axis=-1)


def build_block(kind, count, mean, cov, query, radius, sazo=None):
    """Dispatch on layout kind for the geometry layouts."""
    if kind == "minimal":
        return minimal_block(count, mean, cov, query)
    if kind == "geometric":
        return geometric_block(count, mean, cov, query, radius)
    if kind == "oriented":
        return oriented_block(count, mean, cov, query, radius)
    if kind == "covariance":
        return covariance_block(count, mean, cov, query, radius)
    if kind == "eigen":
        return eigen_block(count, mean, cov, query, radius)
    if kind == "sazo":
        if sazo is None:
            raise ValueError("kind='sazo' requires the sazo statistic")
        return sazo_block(count, mean, cov, query, radius, sazo)
    raise ValueError(f"unknown feature layout {kind!r}")
