"""
Pallas TPU kernel for the fused multiscale masked-moment computation.

One grid step processes one query entry: the (Q, 3) local query block and
its (F, 3) flat candidate block live in VMEM for the whole step, the
distance matrix never touches HBM, and every radius reuses it:

    d2   = |q|^2 + |s|^2 - 2 q s^T      (MXU)
    aug  = [1, x, y, z, xx, xy, xz, yy, yz, zz] (VPU, built in-kernel)
    M_r  = (d2 <= r^2) & valid          (VPU)
    out  = M_r @ aug                    (MXU), one slab per radius

This is the Pallas counterpart of the XLA einsum pair in
nimrud_tpu.ops.grid._entry_stats; numerics are validated against it.
The moment slab is padded to 16 lanes (10 used) for tiling.

Measured on TPU v5e (500k points, 2 radii): XLA's batched einsum path
runs this workload at ~7 ms while the one-entry-per-grid-step Pallas
version takes ~320 ms -- the per-step overhead dominates at these small
per-entry shapes, and XLA's fusion already keeps the distance matrix in
VMEM.  The default backend therefore stays "xla"; this kernel is the
foundation for a future DMA-gather-fused variant (gathering candidate
tiles from HBM inside the kernel, which XLA cannot express).

Replaces, in one pass, the reference's whole per-neighborhood kernel
chain: distance matrix + gather + compaction + covariance accumulation
(reference: nimrud/prototypes/ch.py make_dmat:183, ngrab:1445,
PTshrink:969, PT_cov:494, PTcentroid:614).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MOMENT_PAD = 16         # 10 moment columns padded to a tiling-friendly 16


def _kernel(radii, exclude_radius=None):
    """Kernel body factory (radii are compile-time constants)."""

    def body(q_ref, s_ref, out_ref):
        q = q_ref[0]                      # (Q, 3)
        s = s_ref[0][:, :3]               # (F, 3)
        # validity rides as the 4th coordinate column: Mosaic block
        # shapes want the trailing dims full or (8, 128)-aligned, which
        # a separate (1, F) bool input cannot satisfy
        ones = s_ref[0][:, 3]             # (F,) 1.0 valid / 0.0 pad

        d2 = (jnp.sum(q * q, axis=1)[:, None]
              + jnp.sum(s * s, axis=1)[None, :]
              - 2.0 * jnp.dot(q, s.T,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)

        x, y, z = s[:, 0], s[:, 1], s[:, 2]
        aug = jnp.stack(
            [ones, x, y, z, x * x, x * y, x * z, y * y, y * z, z * z]
            + [jnp.zeros_like(x)] * (MOMENT_PAD - 10), axis=1)
        # zero invalid rows entirely so the mask matmul needs no & with
        # validity (ones column already carries it for the count)
        aug = aug * ones[:, None]

        exclusion = None
        if exclude_radius is not None:
            exclusion = d2 >= exclude_radius * exclude_radius
        for ri, radius in enumerate(radii):
            keep = d2 <= radius * radius
            if exclusion is not None:
                keep = keep & exclusion
            mask = keep.astype(jnp.float32)
            moments = jnp.dot(mask, aug,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            out_ref[0, :, ri * MOMENT_PAD:(ri + 1) * MOMENT_PAD] = moments

    return body


@functools.partial(
    jax.jit, static_argnames=("radii", "interpret", "exclude_radius"))
def entry_moments(q_local, s_local, s_valid, radii, interpret=False,
                  exclude_radius=None):
    """
    Raw masked moments for a batch of entries.

    Args:
      q_local: (E, Q, 3) float32 query points, entry-local frame.
      s_local: (E, F, 3) float32 candidate points, entry-local frame.
      s_valid: (E, F) bool candidate validity.
      radii:   tuple of floats (static).
      interpret: run in Pallas interpreter mode (for CPU tests).

    Returns:
      (E, Q, len(radii) * MOMENT_PAD) float32; per radius the slab is
      [count, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, 0...].
    """
    n_entries, q_cap, _ = q_local.shape
    flat = s_local.shape[1]
    width = len(radii) * MOMENT_PAD

    s_packed = jnp.concatenate(
        [s_local, s_valid.astype(jnp.float32)[..., None]], axis=-1)

    return pl.pallas_call(
        _kernel(tuple(float(r) for r in radii),
                None if exclude_radius is None else float(exclude_radius)),
        grid=(n_entries,),
        in_specs=[
            pl.BlockSpec((1, q_cap, 3), lambda e: (e, 0, 0)),
            pl.BlockSpec((1, flat, 4), lambda e: (e, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_cap, width), lambda e: (e, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_entries, q_cap, width), jnp.float32),
        interpret=interpret,
    )(q_local, s_packed)


def moments_from_slabs(slabs, centers, radii, with_sazo=False,
                       n_attr=0):
    """
    Convert raw Pallas moment slabs to the (count, mean, cov) statistics
    the feature layouts consume (same contract as grid._entry_stats).
    ``centers``: (E, 3) entry centers for restoring the global frame.
    ``with_sazo`` reads the masked max/min signed z offsets the packed
    kernel folds into slab rows 10/11 and resolves them to the SAZO
    statistic (the larger-magnitude extreme; 0 for empty neighborhoods
    -- same contract as ops.moments masked_moments).
    """
    out = []
    for ri, _ in enumerate(radii):
        slab = slabs[:, :, ri * MOMENT_PAD:(ri + 1) * MOMENT_PAD]
        count = slab[..., 0]
        denom = jnp.maximum(count, 1.0)[..., None]
        mean_local = slab[..., 1:4] / denom
        mx, my, mz = (mean_local[..., 0], mean_local[..., 1],
                      mean_local[..., 2])
        outer = jnp.stack(
            [mx * mx, mx * my, mx * mz, my * my, my * mz, mz * mz],
            axis=-1)
        stats = {
            "count": count,
            "mean_local": mean_local,
            "mean": mean_local + centers[:, None, :],
            "cov": slab[..., 4:10] / denom - outer,
        }
        if with_sazo:
            hi, lo = slab[..., 10], slab[..., 11]
            stats["sazo"] = jnp.where(
                count > 0, jnp.where(hi >= -lo, hi, lo), 0.0)
        if n_attr:
            # attribute SUMS ride slab rows 10..10+A (packed kernel);
            # masked mean = sum / count (V_MSO contract)
            stats["attr_mean"] = slab[..., 10:10 + n_attr] / denom
        out.append(stats)
    return out
