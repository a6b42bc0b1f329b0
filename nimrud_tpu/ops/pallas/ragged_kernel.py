"""
Pallas TPU kernel: masked moments over RAGGED packed candidate chunks.

The packed-candidate kernel (nimrud_tpu.ops.pallas.packed_kernel) pads
every entry's candidate block to one static ``c_cap``; real per-entry
candidate totals are heavy-tailed, so even the two-bucket split caps
(span_host.candidate_caps_split) leave the packing gather and the
kernel computing 2-3x dead lanes (1M bench, host mirror: 1.27M live
candidate lanes vs 3.6M split-cap lanes).

Here the candidate array is RAGGED: entry e occupies exactly
ceil(total_e / chunk_width) 128-lane chunks, concatenated.  The kernel
grids over chunks, and a scalar-prefetched chunk->entry table drives
the index maps: chunk g reads entry ce[g]'s query block and center and
accumulates into entry ce[g]'s output slab, with a
flash-attention-style first-chunk init (an entry's chunks are
consecutive, so the revisited output block stays in VMEM between grid
steps and is flushed exactly once).  No per-entry cap exists at all --
lane count equals the measured candidate total, 128-rounded per entry.

Everything else matches the packed kernel: dead lanes gather a FAR
sentinel row the distance masks kill, the entry-local frame is formed
in-kernel from the entry center (bit-identical f32 subtractions), the
moment dot runs all radii in one MXU issue, and sazo / attribute rows
ride slab rows 10+ (MOMENT_PAD layout; see
multiscale_kernel.moments_from_slabs).

Entries with NO chunks (dead entries, or live entries truncated by the
static chunk budget) leave their output slab UNINITIALIZED -- callers
must zero those slabs downstream (device_grid masks with the
per-entry has-chunks flag from _ragged_tables).

Replaces the reference's neighborhood gather + compaction + covariance
chain (reference: nimrud/prototypes/ch.py ngrab:1445, PTshrink:969,
PT_cov:494) with a gather + one streaming ragged kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nimrud_tpu.ops.pallas.multiscale_kernel import MOMENT_PAD
from nimrud_tpu.ops.pallas.packed_kernel import FAR, BIG  # noqa: F401

LANES = 128
CHUNK_W = 128          # candidate lanes per grid step; per-entry totals
                       # round up to this, so smaller = less padding
                       # (1M bench host mirror: 1.64M lanes at 128 vs
                       # 2.15M at 256) but more grid steps


def _ragged_body(radii, exclude_radius, precision, with_sazo, n_attr):
    """One grid step = one CHUNK_W-lane chunk of one entry."""
    if with_sazo and n_attr:
        raise ValueError("sazo and attributes both claim slab rows 10+")
    if n_attr > MOMENT_PAD - 10:
        raise ValueError(
            f"ragged kernel fits at most {MOMENT_PAD - 10} attributes")
    n_r = len(radii)

    def body(ce_ref, center_ref, q_ref, cand_ref, out_ref):
        g = pl.program_id(0)
        first = (g == 0) | (ce_ref[g] != ce_ref[jnp.maximum(g - 1, 0)])

        cx = center_ref[0, 0, 0]
        cy = center_ref[0, 0, 1]
        cz = center_ref[0, 0, 2]
        q = q_ref[0].T                                # (q_cap, 3)
        q_cap = q.shape[0]
        qx = q[:, 0:1] - cx
        qy = q[:, 1:2] - cy
        qz = q[:, 2:3] - cz

        x = cand_ref[0, :] - cx                       # (CHUNK_W,)
        y = cand_ref[1, :] - cy
        z = cand_ref[2, :] - cz

        # squared distances elementwise on the VPU: no cancellation
        # (exact f32 boundary decisions, same as every other backend)
        dx = qx - x[None, :]                          # (q_cap, CHUNK_W)
        dy = qy - y[None, :]
        dz = qz - z[None, :]
        d2 = dx * dx + dy * dy + dz * dz

        attrs = [cand_ref[3 + i, :] for i in range(n_attr)]
        aug = jnp.stack(
            [jnp.ones_like(x), x, y, z,
             x * x, x * y, x * z, y * y, y * z, z * z]
            + attrs
            + [jnp.zeros_like(x)] * (MOMENT_PAD - 10 - n_attr),
            axis=0)                                   # (16, CHUNK_W)

        if exclude_radius is not None:
            base_mask = d2 >= exclude_radius * exclude_radius
            masks = [base_mask & (d2 <= radius * radius)
                     for radius in radii]
        else:
            masks = [d2 <= radius * radius for radius in radii]
        mask_all = jnp.concatenate(masks, axis=0)     # (n_r*q_cap, CW)

        # ONE dot over all radii per precision pass
        if precision == "bf16x2":
            hi = aug.astype(jnp.bfloat16)
            rem = aug - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            m16 = mask_all.astype(jnp.bfloat16)
            mom = sum(jax.lax.dot_general(
                part, m16, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) for part in (hi, mid, lo))
        else:
            mom = jax.lax.dot_general(
                aug, mask_all.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                  # (16, n_r*q_cap)

        if with_sazo:
            # signed z offset s - q = -dz; masked max/min per radius on
            # slab rows 10/11 (max/min-combined across chunks)
            sazo_hi = [jnp.max(jnp.where(mk, -dz, -BIG), axis=1)
                       for mk in masks]               # (q_cap,) each
            sazo_lo = [jnp.min(jnp.where(mk, -dz, BIG), axis=1)
                       for mk in masks]

        for ri in range(n_r):
            rows = mom[:, ri * q_cap:(ri + 1) * q_cap]  # (16, q_cap)
            if with_sazo:
                rows = jnp.concatenate(
                    [rows[:10], sazo_hi[ri][None], sazo_lo[ri][None],
                     rows[12:]], axis=0)
            r0 = ri * MOMENT_PAD

            @pl.when(first)
            def _(rows=rows, r0=r0):
                out_ref[0, r0:r0 + MOMENT_PAD, :] = rows

            @pl.when(jnp.logical_not(first))
            def _(rows=rows, r0=r0, ri=ri):
                prev = out_ref[0, r0:r0 + MOMENT_PAD, :]
                acc = prev + rows
                if with_sazo:
                    acc = jnp.concatenate(
                        [acc[:10],
                         jnp.maximum(prev[10], rows[10])[None],
                         jnp.minimum(prev[11], rows[11])[None],
                         acc[12:]], axis=0)
                out_ref[0, r0:r0 + MOMENT_PAD, :] = acc

    return body


@functools.partial(
    jax.jit,
    static_argnames=("radii", "exclude_radius", "interpret", "precision",
                     "with_sazo", "n_attr"))
def ragged_moments(q_t, cand_t, centers, chunk_entry, radii,
                   exclude_radius=None, interpret=False,
                   precision="highest", with_sazo=False, n_attr=0):
    """
    Raw masked moment slabs over a ragged packed candidate array.

    Args:
      q_t:          (E, 3, q_cap) f32 GLOBAL-frame query blocks,
                    coordinate axis on sublanes (see packed_moments).
      cand_t:       (3 + n_attr, n_chunks * CHUNK_W) f32 GLOBAL-frame
                    candidates; chunk g's lanes are
                    [g*CHUNK_W, (g+1)*CHUNK_W), dead lanes parked at
                    the FAR sentinel.
      centers:      (E, 3) f32 entry centers (global frame).
      chunk_entry:  (n_chunks,) int32 NON-DECREASING chunk -> entry map
                    (an entry's chunks must be consecutive; trailing
                    all-FAR chunks may repeat the last entry).
      radii:        static tuple.

    Returns:
      (E, q_cap, len(radii) * MOMENT_PAD) f32 slabs.  Entries absent
      from ``chunk_entry`` are UNINITIALIZED -- mask them downstream.
    """
    n_entries, _, q_cap = q_t.shape
    if cand_t.shape[0] != 3 + n_attr:
        raise ValueError("cand_t must carry 3 + n_attr rows")
    n_chunks = cand_t.shape[1] // CHUNK_W
    if n_chunks * CHUNK_W != cand_t.shape[1]:
        raise ValueError(f"cand_t lanes must be a multiple of {CHUNK_W}")
    width = len(radii) * MOMENT_PAD

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            # (E, 1, 3) so the block's LAST TWO dims equal the array's
            # -- the TPU lowering rejects a (1, 3) block on (E, 3)
            # (sublane dim 1 neither divisible by 8 nor equal to E)
            pl.BlockSpec((1, 1, 3), lambda g, ce: (ce[g], 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, q_cap), lambda g, ce: (ce[g], 0, 0)),
            pl.BlockSpec((3 + n_attr, CHUNK_W), lambda g, ce: (0, g)),
        ],
        out_specs=pl.BlockSpec((1, width, q_cap),
                               lambda g, ce: (ce[g], 0, 0)),
    )
    out = pl.pallas_call(
        _ragged_body(tuple(float(r) for r in radii),
                     None if exclude_radius is None
                     else float(exclude_radius),
                     {"highest": jax.lax.Precision.HIGHEST,
                      "bf16x2": "bf16x2"}[precision],
                     with_sazo, n_attr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_entries, width, q_cap), jnp.float32),
        interpret=interpret,
    )(chunk_entry, centers.reshape(n_entries, 1, 3), q_t, cand_t)
    return jnp.swapaxes(out, 1, 2)
