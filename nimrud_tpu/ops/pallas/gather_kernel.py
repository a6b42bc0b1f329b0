"""
Pallas TPU kernel: fused DMA-gather masked moments.

The XLA fused path (nimrud_tpu.ops.device_grid) materializes a candidate
index table over the fine grid and gathers (entries x n_off x s_cap)
candidate points before the moment matmuls.  This kernel exploits what
XLA cannot express: the device build sorts search points by fine tile
id, and the (m+2)^3 candidate tiles of a query tile decompose into
(m+2)^2 x-rows of m+2 CONSECUTIVE tile ids -- each x-row is one
CONTIGUOUS segment of the sorted point array.  The kernel DMAs those
spans straight from HBM into a double-buffered VMEM ring and computes
masked moments on each span while the next one is in flight.  No index
table is built, stored, or read.

Layout: Mosaic requires DMA slices to be 128-lane aligned, so the
sorted cloud rides TRANSPOSED as (4, n_pad) -- points along lanes --
and each span window starts at the enclosing 128-aligned lane with the
live range masked ([prefix, prefix + len)).  Points inside the window
beyond the live span are masked out.  Note the span admits ALL points
of its tiles (no per-tile s_cap truncation), which is strictly more
complete than the XLA path when a tile overflows s_cap.

Output slabs use the MOMENT_PAD layout of
nimrud_tpu.ops.pallas.multiscale_kernel, so ``moments_from_slabs``
converts them for the feature layouts.

Replaces the reference's neighborhood gather + compaction + covariance
chain (reference: nimrud/prototypes/ch.py ngrab:1445, PTshrink:969,
PT_cov:494) with a single streaming kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nimrud_tpu.ops.pallas.multiscale_kernel import MOMENT_PAD

LANES = 128
SUB = 512              # DMA sub-chunk: spans are copied in (4, SUB)
                       # pieces so short spans move ~one piece while the
                       # static window covers the worst case


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def span_window(span_rows):
    """Static VMEM window per span: worst-case live rows plus one LANES
    block of alignment prefix, rounded to whole DMA sub-chunks (one
    LANES-rounded chunk when the whole window fits inside SUB)."""
    need = int(span_rows) + LANES
    if need <= SUB:
        return _round_up(need, LANES)
    return _round_up(need, SUB)


STATIC_CHUNKS = 4      # hybrid chunk walk: unrolled head size (lanes
                       # covered = STATIC_CHUNKS * LANES)

STATIC_WALK_CHUNKS = 32  # windows at or below this many 128-lane
                         # chunks use the fully-unrolled walk (fast);
                         # larger windows take the hybrid walk

UNROLL = 4             # span-loop bodies per fori_loop iteration

SLOTS = 8              # default DMA ring depth: spans are short, so the
                       # pipeline is DMA-LATENCY bound, not bandwidth
                       # bound -- a deep ring keeps ~ring-1 copies in
                       # flight to hide the per-copy issue latency


RESIDENT_MAX_LANES = 0         # VMEM-resident search mode is OFF: on
                               # v5e, reading span chunks from a large
                               # VMEM-resident array with DYNAMIC lane
                               # offsets measured ~1.6 us per slice on
                               # the scalar core (1084 ms/extract vs
                               # 345 ms streaming) -- the DMA engine
                               # resolves dynamic offsets in hardware
                               # and is strictly better.  Kept behind
                               # this flag as a record of the probe.


def _kernel_body(radii, window, n_span, exclude_radius, n_pad, batch,
                 precision, ring, debug=None, resident=False):
    """``batch`` entries ride one grid step.  The step's spans arrive
    COMPACTED: live (len > 0) spans first with their owning entry index
    alongside, and ``n_live_ref`` holds the live count -- so the loop
    does DMA + compute for live spans only and dead slots cost one
    scalar compare.  On surface-like clouds most of the (m+2)^2
    candidate rows of a tile are empty, so this is the difference
    between working the real data and working the worst case."""
    width = len(radii) * MOMENT_PAD
    total = batch * n_span
    sub = min(SUB, window)
    n_sub = window // sub
    cw = LANES             # walk chunk width.  128 measured best on
                           # v5e: live data is sparse (~1-3 live chunks
                           # per span), so fine-grained predication
                           # skips more masked compute than wide chunks
                           # save in issue overhead (512-lane walk:
                           # 482 ms/extract vs 345 ms at 128)

    def body(starts_ref, lens_ref, entry_ref, n_live_ref, center_ref,
             q_ref, search_hbm, out_ref, buf=None, sems=None):
        # resident mode: ``search_hbm`` is actually a whole-array VMEM
        # ref; spans are read with direct dynamic slices and the DMA
        # ring (buf/sems scratch) does not exist.
        q_cap = q_ref.shape[2]
        n_live = n_live_ref[0, 0, 0]

        def aligned(k):
            start = jnp.minimum(starts_ref[0, 0, k], n_pad - window)
            base = (start // LANES) * LANES
            return pl.multiple_of(base, LANES), start - base

        def span_dma(k, slot, op):
            # the window covers the worst-case span; copy only the
            # sub-chunks holding live lanes ([0, prefix + len)).  All
            # sub-copies share the slot's semaphore; start and wait run
            # under identical predicates, so the amounts balance.
            # (A single unconditional full-window copy was considered
            # to cut predicated regions, but real spans average ~17
            # live lanes against 2.5-3.5k-lane worst-case windows --
            # full windows would stream ~10 GB/extract on the 1M bench
            # vs ~1.4 GB live-aware; see scripts/span_stats.py.)
            base, prefix = aligned(k)
            need = prefix + lens_ref[0, 0, k]
            for j in range(n_sub):
                # j == 0 always fires: live spans have need >= 1
                @pl.when(j * sub < need)
                def _(j=j):
                    copy = pltpu.make_async_copy(
                        search_hbm.at[:, pl.ds(base + j * sub, sub)],
                        buf.at[slot, :, pl.ds(j * sub, sub)],
                        sems.at[slot],
                    )
                    op(copy)

        def start_dma(k, slot):
            span_dma(k, slot, lambda c: c.start())

        def wait_dma(k, slot):
            span_dma(k, slot, lambda c: c.wait())

        if not resident and debug not in ("nodma", "noboth"):
            for i in range(ring - 1):
                @pl.when(i < n_live)
                def _(i=i):
                    start_dma(i, i)

        # accumulator rides TRANSPOSED (width, q_cap): the moment dot is
        # aug (16, W) @ mask^T (W, q_cap) -- M=16 streams through the
        # MXU while the contraction (W) and output (q_cap) dims tile
        # fully.  The (q_cap, width) layout would put N=16 on the lane
        # axis and waste 7/8 of every pass.
        out_ref[0] = jnp.zeros((batch, width, q_cap), jnp.float32)

        def span_body(k):
                slot = k % ring
                e = entry_ref[0, 0, k]

                if not resident and debug not in ("nodma", "noboth"):
                    @pl.when(k + ring - 1 < n_live)
                    def _():
                        start_dma(k + ring - 1, (k + ring - 1) % ring)

                    wait_dma(k, slot)
                if debug in ("nocompute", "noboth"):
                    return

                q = q_ref[0, e]                        # (q_cap, 3)
                cx = center_ref[0, e, 0]
                cy = center_ref[0, e, 1]
                cz = center_ref[0, e, 2]

                base, prefix = aligned(k)
                live = lens_ref[0, 0, k]

                # the window covers the worst-case span, but most real
                # spans fill a fraction of it: walk only the SUPER-
                # chunks (one DMA sub-chunk wide, up to SUB=512 lanes)
                # that hold live points ([0, prefix + live)).  Wide
                # chunks quarter the number of predicated blocks and
                # run the moment dot at K=cw per pass instead of 128 --
                # per-chunk issue overhead was the measured kernel
                # bottleneck (v5e: ~constant ~6 us/128-lane chunk
                # across every (q_cap, x_seg) config).
                def chunk(c):
                    if resident:
                        # whole search set is VMEM-resident: read the
                        # chunk at its ABSOLUTE (128-aligned) position
                        sl_lane = pl.ds(
                            pl.multiple_of(base + c * cw, LANES), cw)
                        src, row0 = search_hbm, 0
                    elif isinstance(c, int):
                        # STATIC python index -> static slice (free
                        # addressing); traced index (dynamic tail
                        # only) -> aligned dynamic slice
                        sl_lane = slice(c * cw, (c + 1) * cw)
                        src, row0 = buf, slot
                    else:
                        sl_lane = pl.ds(
                            pl.multiple_of(c * cw, LANES), cw)
                        src, row0 = buf, slot
                    if resident:
                        x = src[0, sl_lane] - cx       # (cw,)
                        y = src[1, sl_lane] - cy
                        z = src[2, sl_lane] - cz
                    else:
                        x = src[row0, 0, sl_lane] - cx
                        y = src[row0, 1, sl_lane] - cy
                        z = src[row0, 2, sl_lane] - cz
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, cw), 1)[0] + c * cw
                    valid = (lane >= prefix) & (lane < prefix + live)

                    # squared distances elementwise on the VPU: no
                    # cancellation (exact f32 boundary decisions) and
                    # no K=3 matmul waste
                    dx = q[:, 0:1] - x[None, :]        # (q_cap, LANES)
                    dy = q[:, 1:2] - y[None, :]
                    dz = q[:, 2:3] - z[None, :]
                    d2 = dx * dx + dy * dy + dz * dz

                    # no validity multiply on aug: every radius mask
                    # below already carries ``valid``, and the dot's
                    # mask operand zeroes dead lanes
                    aug = jnp.stack(
                        [jnp.ones_like(x), x, y, z,
                         x * x, x * y, x * z, y * y, y * z, z * z]
                        + [jnp.zeros_like(x)] * (MOMENT_PAD - 10),
                        axis=0)                        # (16, LANES)

                    base_mask = valid[None, :]
                    if exclude_radius is not None:
                        base_mask = base_mask \
                            & (d2 >= exclude_radius * exclude_radius)
                    if precision == "bf16x2":
                        # three DEFAULT passes instead of HIGHEST's six:
                        # aug splits into bf16 hi + mid + lo (~24
                        # mantissa bits reconstructed -- two terms were
                        # not enough once row-packed entries widened the
                        # local frame to a whole segment); the 0/1 mask
                        # is exact in bf16, so counts stay exact
                        hi = aug.astype(jnp.bfloat16)
                        rem = aug - hi.astype(jnp.float32)
                        mid = rem.astype(jnp.bfloat16)
                        lo = (rem - mid.astype(jnp.float32)
                              ).astype(jnp.bfloat16)
                    # ONE dot over all radii per precision pass: the
                    # per-radius masks concatenate along the output
                    # axis, so n_r dots of (16,cw)@(cw,q_cap) become a
                    # single (16,cw)@(cw,n_r*q_cap) -- identical FLOPs,
                    # 1/n_r the MXU invocations (per-dot issue overhead
                    # is the measured per-live-chunk cost driver)
                    mask_all = jnp.concatenate(
                        [base_mask & (d2 <= radius * radius)
                         for radius in radii], axis=0)
                    if precision == "bf16x2":
                        m16 = mask_all.astype(jnp.bfloat16)
                        mom_all = sum(jax.lax.dot_general(
                            part, m16, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) for part in (hi, mid, lo))
                    else:
                        mom_all = jax.lax.dot_general(
                            aug, mask_all.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision
                        )                       # (16, n_r * q_cap)
                    for ri in range(len(radii)):
                        sl = slice(ri * MOMENT_PAD, (ri + 1) * MOMENT_PAD)
                        out_ref[0, e, sl, :] = out_ref[0, e, sl, :] \
                            + mom_all[:, ri * q_cap:(ri + 1) * q_cap]

                # Walk mode is a STATIC per-spec decision: unroll fully
                # while the super-chunk count is modest (predicated
                # blocks pipeline cleanly), fall back to a static head
                # + dynamic tail only for very large windows (a dynamic
                # loop in the walk pays ~2x per live chunk in
                # scalar/loop overhead -- v5e sweep).
                need = prefix + live
                n_chunks_window = window // cw
                if n_chunks_window <= STATIC_WALK_CHUNKS:
                    for c in range(n_chunks_window):
                        @pl.when(c * cw < need)
                        def _(c=c):
                            chunk(c)
                else:
                    n_static = min(STATIC_CHUNKS, n_chunks_window)
                    for c in range(n_static):
                        @pl.when(c * cw < need)
                        def _(c=c):
                            chunk(c)
                    n_chunks = (need + cw - 1) // cw
                    jax.lax.fori_loop(
                        n_static, n_chunks,
                        lambda c, _: (chunk(c), 0)[1], 0)

        # The span loop's scalar machinery is expensive (v5e: an EMPTY
        # loop over the static span-slot count cost 200 ms of a 345 ms
        # extract, ~1.3 us/iteration).  Two cuts: the loop bound is the
        # DYNAMIC live count (spans arrive compacted, so dead slots are
        # never visited at all), and UNROLL bodies per iteration
        # amortize the branch/bounds work of each trip.
        def loop(i, _):
            for j in range(UNROLL):
                k = i * UNROLL + j
                @pl.when(k < n_live)
                def _(k=k):
                    span_body(k)
            return 0

        jax.lax.fori_loop(
            0, (n_live + UNROLL - 1) // UNROLL, loop, 0)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("radii", "span_rows", "exclude_radius", "interpret",
                     "entries_per_step", "precision", "ring", "debug",
                     "resident"))
def span_moments(q_local, centers, span_starts, span_lens,
                 sorted_search_t, radii, span_rows, exclude_radius=None,
                 interpret=False, entries_per_step=8,
                 precision="highest", ring=SLOTS, debug=None,
                 resident=False):
    """
    Raw masked moment slabs via in-kernel span DMA.

    Args:
      q_local:      (E, q_cap, 3) f32 entry-local query blocks.
      centers:      (E, 3) f32 entry centers (global frame).
      span_starts:  (E, n_span) int32 start point-index of each
                    candidate x-row span in the sorted cloud.
      span_lens:    (E, n_span) int32 live points per span, clamped to
                    [0, span_rows]; 0 for empty spans.
      sorted_search_t: (4, n_pad) f32 GLOBAL-frame points sorted by fine
                    tile id, TRANSPOSED (rows x, y, z, unused), lane
                    count n_pad a multiple of 128 with >= span window
                    trailing padding.
      radii:        static tuple.
      span_rows:    static max live points per span ((m+2) * s_cap).
      entries_per_step: entries batched into one grid step (the DMA
                    ring only drains at step boundaries, so larger
                    batches amortize the pipeline bubble; VMEM cost is
                    entries_per_step * q_cap * width floats of output).

    Returns:
      (E, q_cap, len(radii) * MOMENT_PAD) f32 slabs
      (see multiscale_kernel.moments_from_slabs).
    """
    n_entries, q_cap, _ = q_local.shape
    n_span = span_starts.shape[1]
    n_pad = sorted_search_t.shape[1]
    width = len(radii) * MOMENT_PAD
    # window covers a worst-case-misaligned span at 128-lane granularity
    window = span_window(span_rows)
    ring = max(int(ring), 2)

    batch = max(int(entries_per_step), 1)
    pad_e = (-n_entries) % batch
    if pad_e:
        q_local = jnp.concatenate(
            [q_local, jnp.zeros((pad_e, q_cap, 3), q_local.dtype)])
        centers = jnp.concatenate(
            [centers, jnp.zeros((pad_e, 3), centers.dtype)])
        span_starts = jnp.concatenate(
            [span_starts, jnp.zeros((pad_e, n_span), span_starts.dtype)])
        span_lens = jnp.concatenate(
            [span_lens, jnp.zeros((pad_e, n_span), span_lens.dtype)])
    n_steps = (n_entries + pad_e) // batch
    total = batch * n_span

    # compact each step's live spans to the front (with their owning
    # entry index alongside) so the kernel loop runs over real data
    # only; on surface-like clouds most candidate rows are empty
    lens2 = span_lens.reshape(n_steps, total)
    dead = (lens2 == 0).astype(jnp.int32)
    order = jnp.argsort(dead, axis=1).astype(jnp.int32)   # stable
    starts_c = jnp.take_along_axis(
        span_starts.reshape(n_steps, total), order, axis=1)
    lens_c = jnp.take_along_axis(lens2, order, axis=1)
    entry_c = (order // n_span).astype(jnp.int32)
    n_live = (total - jnp.sum(dead, axis=1, dtype=jnp.int32))
    # singleton middle axis: Mosaic wants the last two block dims to
    # divide (8, 128) or equal the array dims
    starts_c = starts_c.reshape(n_steps, 1, total)
    lens_c = lens_c.reshape(n_steps, 1, total)
    entry_c = entry_c.reshape(n_steps, 1, total)
    n_live = n_live.reshape(n_steps, 1, 1)

    out = pl.pallas_call(
        _kernel_body(tuple(float(r) for r in radii), window,
                     int(n_span),
                     None if exclude_radius is None
                     else float(exclude_radius),
                     n_pad, batch,
                     {"highest": jax.lax.Precision.HIGHEST,
                      "bf16x2": "bf16x2"}[precision], ring, debug,
                     resident),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, total), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, total), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, total), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, batch, 3), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, batch, q_cap, 3), lambda g: (g, 0, 0, 0)),
            # sorted cloud: whole-array VMEM residency when it fits
            # (constant block index -> fetched once, reused across all
            # grid steps), HBM + in-kernel span DMA otherwise
            pl.BlockSpec(memory_space=pltpu.VMEM) if resident
            else pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, batch, width, q_cap),
                               lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_steps, batch, width, q_cap), jnp.float32),
        scratch_shapes=[] if resident else [
            pltpu.VMEM((ring, 4, window), jnp.float32),
            pltpu.SemaphoreType.DMA((ring,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_c, lens_c, entry_c, n_live,
      centers.reshape(n_steps, batch, 3),
      q_local.reshape(n_steps, batch, q_cap, 3), sorted_search_t)
    # slabs leave the kernel transposed (width, q_cap); restore the
    # (q_cap, width) contract with one fused XLA transpose
    return jnp.swapaxes(
        out.reshape(-1, width, q_cap), 1, 2)[:n_entries]
