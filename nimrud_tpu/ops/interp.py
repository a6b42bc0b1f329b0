"""
Device-resident attribute interpolation onto voxel centers.

The reference's ``vec_field_interp`` (reference: nimrud/prototypes/
mso.py:178-257) averages per-point attributes over the Chebyshev ball of
radius = voxel edge around every voxel center.  The host path here is
:func:`nimrud_tpu.features.multiscale.voxel_downsample`; this module is
the jit-resident equivalent used by the fused pipeline so V_MSO-style
extraction never leaves the device.

TPU design: the voxel partition IS the search grid.  A Chebyshev ball of
radius ``edge`` around a voxel center is covered by the 3x3x3 block of
voxels around it, so the candidate set for every center is its own
sorted point segment plus the 26 neighbouring segments -- located by
binary search over the (already sorted) unique-key table.  No auxiliary
tile grid, no O(grid) tables: everything is O(points + centers x 27 x
s_cap) with static shapes.
"""

import functools

import jax
import jax.numpy as jnp

from nimrud_tpu.ops.packing import PAD_KEY


def _axis_cells(keys, spec):
    """Unpack int32 voxel keys into per-axis cell indices."""
    cells = []
    for width, shift in zip(spec.widths, spec.shifts):
        cells.append((keys >> shift) & ((1 << width) - 1))
    return cells


def _pack_cells(cells, spec):
    key = cells[0]
    for axis, shift in enumerate(spec.shifts[1:], start=1):
        key = key | (cells[axis] << shift)
    return key


@functools.partial(
    jax.jit,
    static_argnames=("spec", "s_cap", "radius", "metric", "batch",
                     "with_stats"))
def interp_to_voxels(search, s_valid, attributes, spec, s_cap, *,
                     radius=None, metric="chebyshev", batch=512,
                     with_stats=False):
    """
    Voxel-downsample ``search`` under ``spec`` and interpolate per-point
    ``attributes`` onto every voxel center (masked mean over the metric
    ball of ``radius``, default the voxel edge).

    Args:
      search:     (N, 3) float32, padded rows allowed.
      s_valid:    (N,) bool.
      attributes: (N, A) float32, rows aligned with ``search``.
      spec:       packing.GridSpec for the voxel grid.
      s_cap:      max points per voxel (static); overflow is counted
                  when ``with_stats`` and otherwise silently truncated.

    Returns:
      (centers, mask, attr_mean[, stats]): centers (N, 3) sorted by key
      (identical row order to :func:`nimrud_tpu.ops.unique.unique_voxels`
      on the same inputs), validity mask, (N, A) interpolated attributes
      (zeros on padded rows), and optionally the overflow counter dict.
    """
    n = search.shape[0]
    ball = float(spec.edge_length if radius is None else radius)

    keys = jnp.where(s_valid, spec.encode(search), PAD_KEY)
    order = jnp.arange(n, dtype=jnp.int32)
    sorted_keys, sorted_order = jax.lax.sort_key_val(keys, order)

    head = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    live = sorted_keys != PAD_KEY
    seg = jnp.cumsum(head) - 1                       # segment id per point
    is_head = head & live
    target = jnp.where(is_head, seg, n)
    uniq = jnp.full(n, PAD_KEY, jnp.int32).at[target].set(
        sorted_keys, mode="drop")
    starts = jnp.zeros(n, jnp.int32).at[target].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    lens = jnp.zeros(n, jnp.int32).at[
        jnp.where(live, seg, n)].add(1, mode="drop")

    mask = uniq != PAD_KEY
    centers = spec.decode(jnp.where(mask, uniq, 0))
    centers = jnp.where(mask[:, None], centers, 0.0)

    # 27-neighbour voxel rows by binary search over the sorted unique keys
    cells = _axis_cells(uniq, spec)
    caps = [(1 << w) - 1 for w in spec.widths]
    rows = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                moved = [cells[0] + dx, cells[1] + dy, cells[2] + dz]
                ok = mask
                for axis, delta in enumerate((dx, dy, dz)):
                    ok = ok & (moved[axis] >= 0) & (moved[axis] <= caps[axis])
                nkey = _pack_cells(
                    [jnp.clip(c, 0, cap) for c, cap in zip(moved, caps)],
                    spec)
                pos = jnp.searchsorted(uniq, nkey).astype(jnp.int32)
                hit = ok & (uniq[jnp.clip(pos, 0, n - 1)] == nkey) \
                    & (pos < n)
                rows.append(jnp.where(hit, pos, n))
    neighbor_rows = jnp.stack(rows, axis=1)          # (n, 27)

    starts_ext = jnp.concatenate([starts, jnp.zeros(1, jnp.int32)])
    lens_ext = jnp.concatenate([lens, jnp.zeros(1, jnp.int32)])
    # pre-sort points AND attributes by voxel key once: the per-batch
    # candidate positions are then 27 contiguous spans per center, so
    # the (wide) attribute gather feeding the mean matmul reads
    # span-local rows with ONE indirection instead of two scattered ones
    search_sorted = jnp.vstack(
        [search[sorted_order], jnp.zeros((1, 3), search.dtype)])
    attr_sorted = jnp.vstack(
        [attributes[sorted_order],
         jnp.zeros((1, attributes.shape[1]), attributes.dtype)])
    col = jnp.arange(s_cap, dtype=jnp.int32)

    n_batches = -(-n // batch)
    pad_rows = n_batches * batch - n
    centers_b = jnp.concatenate(
        [centers, jnp.zeros((pad_rows, 3), centers.dtype)]
    ).reshape(n_batches, batch, 3)
    rows_b = jnp.concatenate(
        [neighbor_rows, jnp.full((pad_rows, 27), n, jnp.int32)]
    ).reshape(n_batches, batch, 27)

    def one_batch(args):
        ctr, rws = args                               # (B,3), (B,27)
        st = starts_ext[rws]                          # (B,27)
        ln = jnp.minimum(lens_ext[rws], s_cap)
        pos = st[:, :, None] + col[None, None, :]     # (B,27,s_cap)
        within = col[None, None, :] < ln[:, :, None]
        idx = jnp.where(within, jnp.clip(pos, 0, n - 1), n)
        flat = idx.reshape(idx.shape[0], -1)          # (B, 27*s_cap)
        pts = search_sorted[flat]
        vals = attr_sorted[flat]
        delta = pts - ctr[:, None, :]
        if metric == "chebyshev":
            dist = jnp.max(jnp.abs(delta), axis=-1)
        else:
            dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
        inside = (flat < n) & (dist <= ball)
        w = inside.astype(jnp.float32)
        total = jnp.sum(w, axis=1)
        summed = jnp.einsum("bs,bsa->ba", w, vals,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        return summed / jnp.maximum(total, 1.0)[:, None]

    attr_mean = jax.lax.map(one_batch, (centers_b, rows_b))
    attr_mean = attr_mean.reshape(n_batches * batch, -1)[:n]
    attr_mean = jnp.where(mask[:, None], attr_mean, 0.0)

    if not with_stats:
        return centers, mask, attr_mean
    stats = {"dropped_search": jnp.sum(
        jnp.maximum(lens - s_cap, 0) * mask).astype(jnp.int32)}
    return centers, mask, attr_mean, stats


def packed_interp(search, s_valid, attributes, spec, dev_spec, c_cap, *,
                  radius=None, with_stats=False, inner_jit=False,
                  precision="highest"):
    """
    Chebyshev-ball attribute interpolation through the PACKED-candidate
    machinery: same contract as :func:`interp_to_voxels` (masked mean
    over the max-norm ball of ``radius``, default the voxel edge;
    centers in unique-key order; zeros on dead rows), but the
    candidates come from the pack plan's span tables and the mean rides
    the packed moment kernel's attribute rows.

    Why: the 27-span gather above moves 27 x s_cap lanes per center no
    matter how many points exist (864 lanes/center at the production
    s_cap -- 864M gather rows per band at 1M points) and locates the 27
    neighbour rows with jnp.searchsorted, a SERIAL while loop on TPU.
    Measured on v5e (200k-point vector serving step): 28.1 s/step, and
    the 1M program exceeded the worker's runtime budget and crashed it.
    The packed plan moves only real candidates at the measured gather
    floor -- the same machinery the main extraction runs at 17.8M pts/s.

    Sums accumulate in pack order, and the kernel forms ball distances
    in the entry-local frame ((q-ce)-(s-ce) vs the gather interp's raw
    q-s), so attribute means agree with :func:`interp_to_voxels` to f32
    tolerance, not bitwise: points sitting EXACTLY on the ball boundary
    can flip membership (measured 2 of 3947 centers on a 5k uniform
    scene -- the ball radius equals the voxel edge, so voxel-boundary
    points are knife-edge cases).  Deterministic for a given plan;
    callers must keep fit and serving on the SAME interp path (pipeline
    gates both on the packed backend), which makes fit features match
    served features exactly.

    ``dev_spec``: a voxel-edge tile grid over the site bounds whose
    QUERIES are the voxel centers (s_cap must bound the raw cloud's
    per-fine-tile occupancy -- size it host-side).  ``c_cap``: static
    per-entry candidate capacity (host-sized; overflow is counted).
    """
    import jax as _jax
    from nimrud_tpu.ops import device_grid, unique

    edge = float(spec.edge_length)
    ball = float(edge if radius is None else radius)
    if ball > edge:
        raise ValueError(
            "packed interp covers a Chebyshev ball up to one voxel "
            f"edge ({edge}), got radius {ball}")
    interpret = _jax.default_backend() not in ("tpu", "axon")
    centers, _, mask = unique.unique_voxels(search, spec, valid=s_valid)
    fn = device_grid.fused_extract_packed.__wrapped__ if inner_jit \
        else device_grid.fused_extract_packed
    # entry_batch base 2 (not the extraction default 8): the interp's
    # per-entry candidate caps run ~4x the main extract's (raw cloud,
    # not a voxel downsample, behind each center), and 8 unrolled
    # entries' candidate blocks + temporaries overran the 16 MB scoped
    # VMEM budget at the 1M workload (compile-time OOM on v5e).  With
    # multi-bucket (caps, bounds) split capacities only the top bucket
    # is large; the small buckets unroll up to 8 entries again
    # (device_grid._bucket_entry_batch).
    cap = c_cap if isinstance(c_cap, tuple) else int(c_cap)
    out = fn(centers, mask, search, s_valid, dev_spec, (ball,),
             "vector", None, centers.shape[0], cap, interpret,
             2, precision, with_stats=with_stats,
             attributes=attributes, metric="chebyshev")
    if not with_stats:
        return centers, mask, out
    attr_mean, dev_stats = out
    # dropped_query: centers beyond the entry capacity (zero-filled
    # rows); dropped_candidates: per-entry c_cap overflow.  Both mean
    # the interp under-read the cloud -> surface through the one
    # interp-overflow counter the serving diagnostics carry.
    stats = {"dropped_search": (dev_stats["dropped_query"]
                                + dev_stats["dropped_candidates"])}
    return centers, mask, attr_mean, stats


def matmul_interp(search, s_valid, attributes, spec, dev_spec, *,
                  radius=None, with_stats=False):
    """
    Jit-composable body of :func:`interp_to_voxels_matmul` for callers
    that already hold the tile-grid ``dev_spec`` (the staged serving
    path builds it once per model).  Enforces the Chebyshev-ball <=
    voxel-edge contract in one place.
    """
    from nimrud_tpu.ops import device_grid, unique

    edge = float(spec.edge_length)
    ball = float(edge if radius is None else radius)
    if ball > edge:
        raise ValueError(
            "matmul interp covers a Chebyshev ball up to one voxel "
            f"edge ({edge}), got radius {ball}")
    centers, _, mask = unique.unique_voxels(search, spec, valid=s_valid)
    out = device_grid.fused_extract(
        centers, mask, search, s_valid, dev_spec, (ball,), "vector",
        None, "highest", search.shape[0], with_stats, attributes,
        "chebyshev")
    return centers, mask, out


def interp_to_voxels_matmul(search, s_valid, attributes, spec, s_cap,
                            bounds_lo, bounds_hi, *, radius=None,
                            with_stats=False):
    """
    Same contract as :func:`interp_to_voxels`, but the masked Chebyshev
    mean rides the tiled moment MATMUL: attributes become extra columns
    of the kernel's augmented matrix, so the A-wide accumulation runs on
    the MXU in one pass (:func:`nimrud_tpu.ops.device_grid.fused_extract`
    with ``metric="chebyshev"``).  The preferred layout for wide
    attribute blocks (A > ~8), where the 27-span gather's per-value
    indexed reads dominate; it trades HBM for it (a candidate table over
    the fine grid at voxel resolution).

    Needs the real cloud ``bounds_lo``/``bounds_hi`` (host scalars) --
    the voxel grid's bit-budget bounds would explode the tile table.
    """
    from nimrud_tpu.ops import device_grid

    dev_spec = device_grid.make_spec(
        bounds_lo, bounds_hi, float(spec.edge_length),
        n_query=search.shape[0], s_cap=int(s_cap))
    centers, mask, out = matmul_interp(
        search, s_valid, attributes, spec, dev_spec,
        radius=radius, with_stats=with_stats)
    if with_stats:
        attr_mean, dev_stats = out
        return centers, mask, attr_mean, \
            {"dropped_search": dev_stats["dropped_search"]}
    return centers, mask, out
