"""
Pallas TPU kernel: masked moments over dense packed candidate blocks.

The span-DMA kernel (nimrud_tpu.ops.pallas.gather_kernel) streams each
entry's candidate x-row spans from HBM with an in-kernel DMA ring.
Measurement on v5e (scripts/span_stats.py + trace_compute.py debug
modes) showed that design is mismatched to real clouds: spans average
~17 live lanes against worst-case windows of 2.5-3.5k lanes, so the
kernel pays ~1.4 us of scalar-core machinery (loop trip, predication,
SMEM descriptor reads, DMA issue) per span to move a handful of points
-- ~200 ms of a 345 ms extract was the *empty* span loop.

This kernel removes the scalar core from the picture entirely.  The
XLA side packs each entry's spans into one contiguous c_cap-lane
candidate block (one fused row gather -- see
device_grid.fused_extract_packed); dead slots gather a far sentinel
row so the distance masks kill them for free, and the entry-local
frame is formed in-kernel from SMEM centers (bit-identical f32
subtractions, no per-band XLA layout passes).
The kernel is then a pure grid-pipelined sweep: every block spec is a
static index map (Pallas double-buffers the fetches), the walk is a
fully static unroll, and there is no pl.when, no fori_loop, no DMA
ring, and no SMEM descriptor traffic anywhere.

Output slabs use the MOMENT_PAD layout of
nimrud_tpu.ops.pallas.multiscale_kernel, so ``moments_from_slabs``
converts them for the feature layouts.

Replaces the reference's neighborhood gather + compaction + covariance
chain (reference: nimrud/prototypes/ch.py ngrab:1445, PTshrink:969,
PT_cov:494) with a gather + one streaming kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nimrud_tpu.ops.pallas.multiscale_kernel import MOMENT_PAD

LANES = 128

PACK_CW = 512          # compute chunk width: candidates processed per
                       # unrolled step.  Wide chunks keep the moment
                       # dot at K=512 per MXU issue and bound VPU
                       # temporaries to (q_cap, PACK_CW).

FAR = 1.0e6            # dead-slot sentinel magnitude (entry-local
                       # coordinates are tile-scale, so d2 >= 1e12
                       # fails every radius mask; 3 * FAR^2 is finite
                       # in f32)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


BIG = 1.0e30           # sazo fold identity (f32 max is ~3.4e38)


def _packed_body(radii, c_cap, exclude_radius, batch, precision,
                 with_sazo=False, n_attr=0, metric="euclidean"):
    """One grid step = ``batch`` entries.  All addressing is static:
    entry e's candidates live at lanes [e*c_cap, (e+1)*c_cap) of the
    step's candidate block.  ``with_sazo`` additionally folds the
    masked max/min signed z offset per (query, radius) into slab rows
    10/11 (unused by the moment layout); ``n_attr`` candidate
    attributes (cand rows 3..3+n_attr) ride the moment dot as aug rows
    10..10+n_attr (attribute SUMS -- the V_MSO masked mean's
    numerator).  sazo and attributes are mutually exclusive (both
    claim the padding rows; no layout uses both).

    ``metric="chebyshev"`` masks on the max-norm ball instead of the
    euclidean d2 (the V_MSO attribute-interp contract, reference
    nimrud/prototypes/mso.py:178-257); per-axis |d| <= r compares are
    exact f32 decisions, same as the XLA chebyshev path."""
    if with_sazo and n_attr:
        raise ValueError("sazo and attributes both claim slab rows 10+")
    if metric not in ("euclidean", "chebyshev"):
        raise ValueError(f"unknown metric {metric!r}")
    if metric == "chebyshev" and (with_sazo or exclude_radius is not None):
        raise ValueError("chebyshev masks support neither sazo nor "
                         "exclude_radius")
    if n_attr > MOMENT_PAD - 10:
        raise ValueError(
            f"packed kernel fits at most {MOMENT_PAD - 10} attributes")
    width = len(radii) * MOMENT_PAD
    cw = min(PACK_CW, c_cap)

    def body(center_ref, q_ref, cand_ref, out_ref):
        # center_ref: (1, batch, 3) f32 entry centers, SMEM
        # q_ref:    (1, batch, 3, q_cap) f32 GLOBAL-frame queries with
        #           the COORDINATE axis on sublanes: a materialized
        #           f32[..., q_cap, 3] HBM array pays the (8, 128) lane
        #           pad 3 -> 128 (42x -- ~8.6 GB of dead bytes at the
        #           10M-point workload), while (..., 3, q_cap) pays 8/3.
        #           One (3, q_cap) -> (q_cap, 3) transpose per entry
        #           restores the sublane-vector orientation the masked
        #           moment math wants; the entry-local frame is formed
        #           here (the same f32 subtractions the XLA paths do,
        #           so radius decisions stay bit-identical)
        # cand_ref: (3, batch * c_cap) f32 GLOBAL-frame candidates
        #           (rows x, y, z); dead slots gathered the FAR
        #           sentinel row, so their entry-local coordinates land
        #           ~FAR and every radius mask drops them.  The center
        #           subtract lives HERE (scalar broadcast per entry)
        #           rather than on the XLA side, where it cost a fused
        #           (N, 3) select + subtract + repeat pass per band.
        # out_ref:  (1, batch, width, q_cap) f32 moment slabs,
        #           TRANSPOSED (width, q_cap) per entry: the dot is
        #           aug (16, cw) @ mask (cw, n_r*q_cap) -- M=16
        #           streams through the MXU while K and N tile fully.
        q_cap = q_ref.shape[3]

        for e in range(batch):
            cx = center_ref[0, e, 0]
            cy = center_ref[0, e, 1]
            cz = center_ref[0, e, 2]
            q = q_ref[0, e].T                          # (q_cap, 3)
            qx = q[:, 0:1] - cx                        # (q_cap, 1)
            qy = q[:, 1:2] - cy
            qz = q[:, 2:3] - cz
            acc, sazo_max, sazo_min = _entry_sweep(
                radii, c_cap, exclude_radius, cw, precision, with_sazo,
                n_attr, cand_ref, e, cx, cy, cz, qx, qy, qz,
                metric=metric)

            for ri in range(len(radii)):
                out_ref[0, e, ri * MOMENT_PAD:(ri + 1) * MOMENT_PAD, :] \
                    = acc[:, ri * q_cap:(ri + 1) * q_cap]
            if with_sazo:
                for ri in range(len(radii)):
                    out_ref[0, e, ri * MOMENT_PAD + 10, :] = sazo_max[ri]
                    out_ref[0, e, ri * MOMENT_PAD + 11, :] = sazo_min[ri]

    return body


def _entry_sweep(radii, c_cap, exclude_radius, cw, precision, with_sazo,
                 n_attr, cand_ref, e, cx, cy, cz, qx, qy, qz,
                 metric="euclidean"):
    """One entry's chunked candidate sweep.  ``qx/qy/qz`` are the
    (q_cap, 1) ENTRY-LOCAL query columns; returns
    (acc, sazo_max, sazo_min)."""
    q_cap = qx.shape[0]
    acc = None
    sazo_max = sazo_min = None
    if with_sazo:
        sazo_max = [jnp.full((q_cap,), -BIG, jnp.float32)
                    for _ in radii]
        sazo_min = [jnp.full((q_cap,), BIG, jnp.float32)
                    for _ in radii]
    for start in range(0, c_cap, cw):
        w = min(cw, c_cap - start)
        lane0 = e * c_cap + start
        x = cand_ref[0, lane0:lane0 + w] - cx          # (w,)
        y = cand_ref[1, lane0:lane0 + w] - cy
        z = cand_ref[2, lane0:lane0 + w] - cz

        # squared distances elementwise on the VPU: no
        # cancellation (exact f32 boundary decisions) and no
        # K=3 matmul waste
        dx = qx - x[None, :]                           # (q_cap, cw)
        dy = qy - y[None, :]
        dz = qz - z[None, :]
        if metric == "chebyshev":
            d2 = jnp.maximum(jnp.maximum(jnp.abs(dx), jnp.abs(dy)),
                             jnp.abs(dz))              # max-norm |d|
        else:
            d2 = dx * dx + dy * dy + dz * dz

        attrs = [cand_ref[3 + i, lane0:lane0 + w]
                 for i in range(n_attr)]               # global values
        aug = jnp.stack(
            [jnp.ones_like(x), x, y, z,
             x * x, x * y, x * z, y * y, y * z, z * z]
            + attrs
            + [jnp.zeros_like(x)] * (MOMENT_PAD - 10 - n_attr),
            axis=0)                                    # (16, cw)

        if metric == "chebyshev":
            masks = [d2 <= radius for radius in radii]
        elif exclude_radius is not None:
            base_mask = d2 >= exclude_radius * exclude_radius
            masks = [base_mask & (d2 <= radius * radius)
                     for radius in radii]
        else:
            masks = [d2 <= radius * radius for radius in radii]
        mask_all = jnp.concatenate(
            masks, axis=0)                             # (n_r*q_cap, cw)

        if with_sazo:
            # signed z offset s - q, frame-free; fold masked
            # max/min per radius (reference SAZO statistic)
            for ri, mk in enumerate(masks):
                sazo_max[ri] = jnp.maximum(
                    sazo_max[ri],
                    jnp.max(jnp.where(mk, -dz, -BIG), axis=1))
                sazo_min[ri] = jnp.minimum(
                    sazo_min[ri],
                    jnp.min(jnp.where(mk, -dz, BIG), axis=1))

        # ONE dot over all radii per precision pass (the
        # per-radius masks concatenate along the output axis)
        if precision == "bf16x2":
            # three DEFAULT passes instead of HIGHEST's six:
            # aug splits into bf16 hi + mid + lo; the 0/1 mask
            # is exact in bf16, so counts stay exact
            hi = aug.astype(jnp.bfloat16)
            rem = aug - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = (rem - mid.astype(jnp.float32)
                  ).astype(jnp.bfloat16)
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
                precision=precision)                   # (16, n_r*q_cap)
        acc = mom if acc is None else acc + mom
    return acc, sazo_max, sazo_min


@functools.partial(
    jax.jit,
    static_argnames=("radii", "exclude_radius", "interpret",
                     "entries_per_step", "precision", "with_sazo",
                     "n_attr", "metric"))
def packed_moments(q_t, cand_t, centers, radii, exclude_radius=None,
                   interpret=False, entries_per_step=8,
                   precision="highest", with_sazo=False, n_attr=0,
                   metric="euclidean"):
    """
    Raw masked moment slabs over dense packed candidate blocks.

    Args:
      q_t:          (E, 3, q_cap) f32 GLOBAL-frame query blocks with
                    the coordinate axis on sublanes (the (E, q_cap, 3)
                    layout pays a 42x HBM lane pad -- see the body
                    comment; the kernel forms the entry-local frame
                    itself).
      cand_t:       (3, E * c_cap) f32 GLOBAL-frame candidates,
                    TRANSPOSED (rows x, y, z); entry e's block
                    occupies lanes [e*c_cap, (e+1)*c_cap), dead slots
                    parked at the FAR sentinel.  c_cap must be a
                    multiple of 128.
      centers:      (E, 3) f32 entry centers (global frame); the kernel
                    forms the entry-local frame itself.
      radii:        static tuple.
      entries_per_step: entries batched into one grid step.

    Returns:
      (E, q_cap, len(radii) * MOMENT_PAD) f32 slabs
      (see multiscale_kernel.moments_from_slabs).
    """
    n_entries, _, q_cap = q_t.shape
    if cand_t.shape[0] != 3 + n_attr:
        raise ValueError("cand_t must carry 3 + n_attr rows")
    c_cap = cand_t.shape[1] // n_entries
    if c_cap * n_entries != cand_t.shape[1]:
        raise ValueError("cand_t lane count must be E * c_cap")
    if c_cap % LANES:
        raise ValueError(f"c_cap must be a multiple of {LANES}")
    width = len(radii) * MOMENT_PAD

    batch = max(int(entries_per_step), 1)
    pad_e = (-n_entries) % batch
    if pad_e:
        q_t = jnp.concatenate(
            [q_t, jnp.zeros((pad_e, 3, q_cap), q_t.dtype)])
        cand_t = jnp.concatenate(
            [cand_t,
             jnp.full((3 + n_attr, pad_e * c_cap), FAR, cand_t.dtype)],
            axis=1)
        centers = jnp.concatenate(
            [centers, jnp.zeros((pad_e, 3), centers.dtype)])
    n_steps = (n_entries + pad_e) // batch

    out = pl.pallas_call(
        _packed_body(tuple(float(r) for r in radii), int(c_cap),
                     None if exclude_radius is None
                     else float(exclude_radius),
                     batch,
                     {"highest": jax.lax.Precision.HIGHEST,
                      "bf16x2": "bf16x2"}[precision], with_sazo,
                     n_attr, metric),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, batch, 3), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, batch, 3, q_cap), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((3 + n_attr, batch * c_cap),
                         lambda g: (0, g)),
        ],
        out_specs=pl.BlockSpec((1, batch, width, q_cap),
                               lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, batch, width, q_cap), jnp.float32),
        interpret=interpret,
    )(centers.reshape(n_steps, batch, 3),
      q_t.reshape(n_steps, batch, 3, q_cap), cand_t)
    # slabs leave the kernel transposed (width, q_cap); restore the
    # (q_cap, width) contract with one fused XLA transpose
    return jnp.swapaxes(
        out.reshape(-1, width, q_cap), 1, 2)[:n_entries]
