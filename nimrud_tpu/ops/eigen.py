"""
Closed-form eigendecomposition of batched symmetric 3x3 matrices.

The trigonometric analytic eigensolver is the right algorithm for TPU:
branch-light, matmul-free, fully vectorized on the VPU, no iteration.
The reference reached the same conclusion for its GPU (analytic kernel at
reference: nimrud/prototypes/ch.py:848-962, with a diagonal fast path);
this is an independent implementation of the textbook method
(Smith 1961 trigonometric solution for real symmetric 3x3).

Matrices are packed as 6-vectors ``[xx, xy, xz, yy, yz, zz]`` (upper
triangle, row-major) -- the layout the moment accumulator emits.
"""

import jax.numpy as jnp


def eigvalsh3(m6):
    """
    Eigenvalues of symmetric 3x3 matrices, **descending**.

    Args:
      m6: (..., 6) packed [xx, xy, xz, yy, yz, zz].

    Returns:
      (..., 3) eigenvalues, largest first.
    """
    xx, xy, xz, yy, yz, zz = [m6[..., i] for i in range(6)]

    q = (xx + yy + zz) / 3.0
    dxx, dyy, dzz = xx - q, yy - q, zz - q
    off = xy * xy + xz * xz + yz * yz
    p2 = dxx * dxx + dyy * dyy + dzz * dzz + 2.0 * off
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    # guard the p==0 case (scalar matrix): all eigenvalues equal q
    safe_p = jnp.where(p > 0, p, 1.0)
    bxx, byy, bzz = dxx / safe_p, dyy / safe_p, dzz / safe_p
    bxy, bxz, byz = xy / safe_p, xz / safe_p, yz / safe_p
    half_det = 0.5 * (
        bxx * (byy * bzz - byz * byz)
        - bxy * (bxy * bzz - byz * bxz)
        + bxz * (bxy * byz - byy * bxz))
    half_det = jnp.clip(half_det, -1.0, 1.0)

    phi = jnp.arccos(half_det) / 3.0
    two_p = 2.0 * p
    big = q + two_p * jnp.cos(phi)
    small = q + two_p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    mid = 3.0 * q - big - small

    eigs = jnp.stack([big, mid, small], axis=-1)
    return jnp.where(p2[..., None] > 0, eigs, jnp.stack([q, q, q], axis=-1))


def _eigvec_for(m6, lam):
    """
    One eigenvector of each packed matrix for eigenvalue ``lam`` via the
    largest cross product of rows of (A - lam*I).  Degenerate (repeated
    eigenvalue / zero matrix) inputs fall back to a coordinate axis; the
    vector is unit-norm either way.  Sign is arbitrary, as with any
    eigensolver.
    """
    xx, xy, xz, yy, yz, zz = [m6[..., i] for i in range(6)]
    r0 = jnp.stack([xx - lam, xy, xz], axis=-1)
    r1 = jnp.stack([xy, yy - lam, yz], axis=-1)
    r2 = jnp.stack([xz, yz, zz - lam], axis=-1)

    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)

    best = jnp.where(n01 >= n02, c01, c02)
    best_n = jnp.maximum(n01, n02)
    best = jnp.where(best_n >= n12, best, c12)
    best_n = jnp.maximum(best_n, n12)

    fallback = jnp.zeros_like(best).at[..., 2].set(1.0)
    scale = jnp.max(jnp.abs(m6), axis=-1, keepdims=True) + \
        jnp.abs(lam)[..., None]
    degenerate = best_n <= (1e-12 * scale * scale) ** 2
    vec = jnp.where(degenerate, fallback, best)
    norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
    return vec / jnp.maximum(norm, 1e-30)


def eigh3(m6):
    """
    Eigenvalues (descending) and matching unit eigenvectors of packed
    symmetric 3x3 matrices.

    Returns:
      ``(values, vectors)`` with values (..., 3) descending and vectors
      (..., 3, 3) where ``vectors[..., i, :]`` belongs to ``values[..., i]``.
      Vector signs are arbitrary.  For well-separated eigenvalues the
      vectors are orthonormal; the middle vector is derived as a cross
      product so the basis stays right-handed and orthogonal even under
      mild degeneracy.
    """
    vals = eigvalsh3(m6)
    v_big = _eigvec_for(m6, vals[..., 0])
    v_small = _eigvec_for(m6, vals[..., 2])
    v_mid = jnp.cross(v_small, v_big)
    norm = jnp.sqrt(jnp.sum(v_mid * v_mid, axis=-1, keepdims=True))
    # fully degenerate case (sphere): fall back to a coordinate axis
    v_mid = jnp.where(norm > 1e-12,
                      v_mid / jnp.maximum(norm, 1e-30),
                      jnp.zeros_like(v_mid).at[..., 1].set(1.0))
    vecs = jnp.stack([v_big, v_mid, v_small], axis=-2)
    return vals, vecs


def pack_sym3(matrices):
    """(..., 3, 3) symmetric matrices -> (..., 6) packed upper triangle."""
    return jnp.stack([
        matrices[..., 0, 0], matrices[..., 0, 1], matrices[..., 0, 2],
        matrices[..., 1, 1], matrices[..., 1, 2], matrices[..., 2, 2],
    ], axis=-1)


def unpack_sym3(m6):
    """(..., 6) packed upper triangle -> (..., 3, 3) symmetric matrices."""
    xx, xy, xz, yy, yz, zz = [m6[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
