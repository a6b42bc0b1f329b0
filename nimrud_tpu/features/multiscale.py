"""
Multiscale feature extraction driver.

The public entry point is :func:`extract_scaleset`: for each *band*
``(voxel_edge, radii)`` the search cloud is voxel-downsampled once and all
of the band's radii share one distance computation (the reference's
descending-scale reuse, reference: nimrud/prototypes/mso.py:263-366,
apc.py:514-518).  Features for every radius are concatenated left to
right, bands in caller order.

TPU design notes:
  * all shapes padded to static buckets (powers of two) so jit compiles a
    small, reusable set of kernels;
  * query points are processed in spatially coherent chunks -- the driver
    sorts them by voxel key and restores order on the way out -- keeping
    fp32 arithmetic centered and small;
  * the dense masked-moment kernel is O(|query| x |search-voxels|); large
    clouds are tiled above this layer (nimrud_tpu.parallel /
    workflows) exactly as the reference partitioned before calling its
    MSO chains.
"""

import numpy as np
import jax.numpy as jnp

from nimrud_tpu.features import layouts
from nimrud_tpu.ops import grid, moments, packing, unique
from nimrud_tpu.utils.geometry import VoxelFilter

# cap on query-chunk x search pairs per kernel invocation (fp32 elements)
PAIRS_BUDGET = 1 << 24

# auto method: switch from the dense O(N*S) path to the tiled hash-grid
# path once the search set exceeds this
TILED_THRESHOLD = 16384

KINDS = ("minimal", "geometric", "oriented", "covariance", "eigen",
         "sazo", "vector")
METHODS = ("auto", "dense", "tiled", "fused")


def _pow2_bucket(n, minimum=128):
    bucket = minimum
    while bucket < n:
        bucket *= 2
    return bucket


def _pad_rows_f32(array, target):
    n = array.shape[0]
    if n == target:
        return np.ascontiguousarray(array, dtype=np.float32)
    out = np.zeros((target,) + array.shape[1:], dtype=np.float32)
    out[:n] = array
    if n:
        out[n:] = array[-1]
    return out


def _effective_chunk(chunk_size, n_search_padded):
    """
    Power-of-two chunk no larger than ``chunk_size`` keeping the
    chunk x search distance block within the pairs budget.  Power of two
    so it always divides the (chunk_size-multiple) padded query length.
    """
    chunk = min(chunk_size, max(64, PAIRS_BUDGET // max(n_search_padded, 1)))
    out = 64
    while out * 2 <= chunk:
        out *= 2
    return out


HOST_VOXEL_THRESHOLD = 200_000


def _host_unique_voxels(search, edge, bounds=None):
    """Host voxel downsample: faster than shipping a large cloud to a
    remote device and the deduped centers back.  Native C++ when
    available, NumPy VoxelFilter otherwise.

    ``bounds``: explicit (lo, hi) grid anchor.  Default anchors at the
    search cloud's own bounds (VoxelFilter convention); models with
    fixed site ``bounds=`` pass theirs so fit-time voxelization matches
    the serving grid EXACTLY (a different anchor is a different voxel
    set, i.e. different features)."""
    from nimrud_tpu import native
    s64 = search.astype(np.float64)
    if bounds is None:
        b_lo, b_hi = s64.min(0), s64.max(0)
    else:
        b_lo = np.asarray(bounds[0], np.float64)
        b_hi = np.asarray(bounds[1], np.float64)
    origin = b_lo - edge / 2
    span = (b_hi + edge / 2) - origin
    dims = np.maximum(np.ceil(span / edge).astype(np.int64), 1)
    centers = native.voxel_unique(search, origin, edge, dims)
    if centers is not None:
        return centers
    # NumPy fallback mirrors the native kernel's clipped grid math
    cell = np.clip(np.floor((s64 - origin) / edge).astype(np.int64),
                   0, dims - 1)
    addr = (cell[:, 0] + cell[:, 1] * dims[0]
            + cell[:, 2] * dims[0] * dims[1])
    cell = np.unique(addr)
    cx = cell % dims[0]
    cy = (cell // dims[0]) % dims[1]
    cz = cell // (dims[0] * dims[1])
    return (origin[None, :] + (np.stack([cx, cy, cz], axis=1) + 0.5)
            * edge).astype(np.float32)


def voxel_downsample(search, edge, attributes=None,
                     interp_metric="chebyshev", bounds=None):
    """
    Voxel-downsample a search cloud at ``edge``, optionally interpolating
    per-point attributes onto the voxel centers (masked mean within
    ``edge`` of each center -- the reference's vec_field_interp,
    reference: nimrud/prototypes/mso.py:178-257).

    Returns ``(centers, attrs)`` as NumPy arrays (attrs None if not given).
    Uses the int32 device path when the grid fits the 30-bit key budget,
    else the host 64-bit VoxelFilter.

    ``bounds``: explicit (lo, hi) voxel-grid anchor (default: the search
    cloud's bounds).  Fixed-``bounds`` models pass theirs so every
    extraction voxelizes on the SERVING grid.
    """
    search = np.asarray(search, dtype=np.float32)
    if search.shape[0] >= HOST_VOXEL_THRESHOLD:
        spec = None
    else:
        try:
            if bounds is None:
                spec = packing.GridSpec.fit(search, edge)
            else:
                spec = packing.GridSpec.fit_bounds(
                    np.asarray(bounds[0], np.float64),
                    np.asarray(bounds[1], np.float64), edge)
        except ValueError:
            spec = None

    if spec is not None:
        padded = _pad_rows_f32(search, _pow2_bucket(search.shape[0]))
        valid = np.zeros(padded.shape[0], dtype=bool)
        valid[:search.shape[0]] = True
        centers, count, _ = unique.unique_voxels(
            jnp.asarray(padded), spec, valid=jnp.asarray(valid))
        centers = np.asarray(centers)[:int(count)]
    else:
        centers = _host_unique_voxels(search, edge, bounds=bounds)

    if attributes is None:
        return centers, None

    attributes = np.asarray(attributes, dtype=np.float32)
    n_centers = centers.shape[0]

    if search.shape[0] >= TILED_THRESHOLD:
        # large clouds: interpolate through the tile grid (the Chebyshev
        # ball of radius `edge` fits a tile edge of `edge`)
        problem = grid.build_tiled_problem(centers, search, edge)
        got = grid.tiled_moments(
            problem, centers, search, (float(edge),),
            attributes=attributes, metric=interp_metric)
        return centers, got["attr_mean"][:, 0, :]

    c_bucket = _pow2_bucket(n_centers)
    s_bucket = _pow2_bucket(search.shape[0])
    centers_padded = _pad_rows_f32(centers, c_bucket)
    search_padded = _pad_rows_f32(search, s_bucket)
    attrs_padded = _pad_rows_f32(attributes, s_bucket)
    valid = np.zeros(s_bucket, dtype=bool)
    valid[:search.shape[0]] = True
    got = moments.multiscale_moments(
        jnp.asarray(centers_padded), jnp.asarray(search_padded),
        jnp.asarray(valid), (float(edge),),
        attributes=jnp.asarray(attrs_padded),
        chunk_size=_effective_chunk(256, s_bucket),
        metric=interp_metric)
    center_attrs = np.asarray(got["attr_mean"])[:n_centers, 0, :]
    return centers, center_attrs


def _band_features(query_padded, n_query, search, kind, edge, radii,
                   attributes, exclude_radius, chunk_size, method,
                   tuning, bounds=None):
    """Features for one (edge, radii) band.  Query already padded/sorted."""
    if edge and edge > 0:
        if kind == "vector":
            centers, attrs = voxel_downsample(search, edge, attributes,
                                              bounds=bounds)
        else:
            centers, attrs = voxel_downsample(search, edge,
                                              bounds=bounds)
    else:
        centers = np.asarray(search, dtype=np.float32)
        attrs = None if attributes is None \
            else np.asarray(attributes, dtype=np.float32)

    use_tiled = method == "tiled" or (
        method == "auto" and centers.shape[0] >= TILED_THRESHOLD)

    if use_tiled:
        query_actual = query_padded[:n_query]
        problem = grid.build_tiled_problem(
            query_actual, centers, tile_edge=max(radii),
            query_tile_factor=tuning.get("query_tile_factor", 3),
            query_capacity=tuning.get("query_capacity"),
            entry_batch=tuning.get("entry_batch", 256))
        return grid.tiled_features(
            problem, query_actual, centers, radii, kind,
            attributes=attrs if kind == "vector" else None,
            exclude_radius=exclude_radius,
            entry_batch=tuning.get("entry_batch", 256),
            precision=tuning.get("precision", "highest"))
    else:
        s_bucket = _pow2_bucket(centers.shape[0])
        search_padded = _pad_rows_f32(centers, s_bucket)
        valid = np.zeros(s_bucket, dtype=bool)
        valid[:centers.shape[0]] = True

        kwargs = dict(
            chunk_size=_effective_chunk(chunk_size, s_bucket),
            exclude_radius=exclude_radius,
            with_sazo=layouts.needs_sazo(kind))
        if kind == "vector":
            kwargs["attributes"] = jnp.asarray(_pad_rows_f32(attrs, s_bucket))

        got = moments.multiscale_moments(
            jnp.asarray(query_padded), jnp.asarray(search_padded),
            jnp.asarray(valid), tuple(radii), **kwargs)

    blocks = []
    for ri, radius in enumerate(radii):
        if kind == "vector":
            block = got["attr_mean"][:, ri, :]
        else:
            block = layouts.build_block(
                kind, got["count"][:, ri], got["mean"][:, ri],
                got["cov"][:, ri], jnp.asarray(query_padded), float(radius),
                sazo=None if "sazo" not in got else got["sazo"][:, ri])
        blocks.append(block[:n_query])
    return jnp.concatenate(blocks, axis=1)


def _interp_packed_plan(search, vox_spec, lo, hi, s_bounds, m,
                        host_centers=None, segment_wide=False):
    """Host-side spec + candidate capacity for the PACKED attribute
    interp (ops.interp.packed_interp): a voxel-edge tile grid whose
    queries are the band's voxel centers and whose search side is the
    RAW cloud.

    s_cap must bound raw points per fine tile (the span tables clip at
    span_rows = (x_seg*m+2)*s_cap): the tile grid anchors ~half a voxel
    off the voxel grid, so a tile overlaps at most 8 voxels -- 8x the
    measured max voxel occupancy is a hard bound on the sizing cloud
    (denser serving clouds overflow into the counted interp
    diagnostic via c_cap first)."""
    from nimrud_tpu.ops import device_grid, span_host

    edge = float(vox_spec.edge_length)
    search = np.asarray(search, np.float32)[:, :3]
    if host_centers is None:
        host_centers = _host_unique_voxels(search, edge, bounds=s_bounds)
    occ = _voxel_occupancy_cap(search, vox_spec)
    # q_cap 128 / x_seg 1 (not the extraction's 512 / 32): the interp
    # grid's tile edge EQUALS the ball radius (the main extract's fine
    # tile is max(radii), >= every ball), so an entry's candidate box
    # is pure voxel-scale fringe -- while its x-extent is the whole
    # x-SEGMENT.  At x_seg=32 the coarse band's entry boxes swallowed
    # ~96 m x-runs of the RAW cloud (c_cap ~47k lanes; ~92 unrolled
    # compute chunks overran the kernel's 16 MB scoped-VMEM stack at
    # compile time on v5e, measured twice at q_cap 512 and 128).  One
    # coarse tile per segment bounds the box at (m+2)^3 fine tiles and
    # c_cap at the main extract's known-good scale.
    ispec = device_grid.make_spec(
        lo, hi, edge, n_query=_pow2_bucket(search.shape[0]),
        q_cap=128, m=m, x_seg=1,
        s_cap=_pow2_bucket(8 * occ, minimum=8))
    ispec = device_grid.with_entry_estimate(ispec, host_centers)
    if segment_wide:
        # multichip sizing: each SHARD packs its own center subset into
        # entries this host mirror cannot reproduce, but any packing's
        # candidate set is a subset of the segment-wide rows -- and the
        # split buckets' rank cuts are meaningless across shard
        # packings, so the multichip program takes ONE bounding cap
        icap = span_host.candidate_cap(host_centers, search, ispec,
                                       segment_wide=True)
        return ispec, int(icap)
    # multi-bucket split caps (same machinery as the main extract):
    # the interp's per-entry totals against the RAW cloud are heavy-
    # tailed, and the single max-sized cap wasted ~3-5x the live lanes
    # (ROADMAP round 5: ~29M candidate lanes/band at 1M points, the
    # interp ~630 ms of the 687 ms vector serving step).  Small-cap
    # buckets also unroll more entries per kernel step within the
    # scoped-VMEM budget (device_grid._bucket_entry_batch).
    icap = span_host.candidate_caps_split(host_centers, search, ispec)
    if not isinstance(icap, tuple):
        return ispec, int(icap)
    return ispec, icap


def _voxel_occupancy_cap(search, spec):
    """Host upper bound on raw points per voxel (one key sort)."""
    s64 = search.astype(np.float64)
    origin = np.asarray(spec.origin)
    cell = np.floor((s64 - origin) / spec.edge_length).astype(np.int64)
    cell = np.clip(cell, 0, [2 ** w - 1 for w in spec.widths])
    key = cell[:, 0]
    for axis, shift in enumerate(spec.shifts[1:], start=1):
        key = key | (cell[:, axis] << shift)
    _, counts = np.unique(key, return_counts=True)
    return int(counts.max())


def extract_scaleset_fused(query, search, scaleset, kind="minimal", *,
                           attributes=None, exclude_radius=None,
                           tuning=None, bounds=None):
    """
    Fully device-resident extraction: voxel downsample, tile-grid build,
    masked moments, layout and scatter all happen in jitted XLA -- the
    host only computes dataset bounds and uploads the clouds once.

    Requirements: every band must voxel-downsample (edge > 0) and the
    voxel grids must fit the int32 key budget; ``kind="vector"``
    additionally interpolates ``attributes`` onto the voxel centers on
    device (:func:`nimrud_tpu.ops.interp.interp_to_voxels`).  Raises
    ValueError when not applicable (callers fall back to
    :func:`extract_scaleset_device`).

    Returns a device array (n_query, width).
    """
    from nimrud_tpu.ops import device_grid, interp

    if kind == "vector" and attributes is None:
        raise ValueError("kind='vector' requires attributes")
    tuning = tuning or {}
    query = np.asarray(query, dtype=np.float32)[:, :3]
    search = np.asarray(search, dtype=np.float32)[:, :3]
    scaleset = [(float(edge), tuple(float(r) for r in radii))
                for edge, radii in scaleset]
    if any(edge <= 0 for edge, _ in scaleset):
        raise ValueError("fused path requires voxel edges > 0")

    n_query = query.shape[0]
    if bounds is not None:
        # explicit site bounds govern EVERY grid (exactly like the
        # fixed-bounds serving path: out-of-bounds points clip); fit
        # features extracted this way match serving bit-for-bit
        lo = np.asarray(bounds[0], np.float64)
        hi = np.asarray(bounds[1], np.float64)
        s_lo, s_hi = lo, hi
    else:
        lo = np.minimum(query.min(0), search.min(0)).astype(np.float64)
        hi = np.maximum(query.max(0), search.max(0)).astype(np.float64)
        # the voxel grid anchors at the SEARCH bounds (VoxelFilter
        # convention) so every method voxelizes identically
        s_lo = search.min(0).astype(np.float64)
        s_hi = search.max(0).astype(np.float64)

    q_bucket = _pow2_bucket(n_query)
    s_bucket = _pow2_bucket(search.shape[0])
    query_dev = jnp.asarray(_pad_rows_f32(query, q_bucket))
    search_dev = jnp.asarray(_pad_rows_f32(search, s_bucket))
    q_valid = jnp.arange(q_bucket) < n_query
    s_valid = jnp.arange(s_bucket) < search.shape[0]
    attrs_dev = None
    if kind == "vector":
        attributes = np.asarray(attributes, dtype=np.float32)
        attrs_dev = jnp.asarray(_pad_rows_f32(attributes, s_bucket))

    backend = tuning.get("backend")
    if backend is None:
        # default to the production packed backend on real TPU
        # (trace-measured ~13x the XLA candidate-table path on the
        # 1M bench); XLA elsewhere -- the Pallas kernels only run
        # interpreted off-TPU, which is for tests
        import jax
        backend = "packed" \
            if jax.default_backend() in ("tpu", "axon") else "xla"
    if backend not in ("xla", "pallas", "packed"):
        # reject, don't silently fall back: "ragged" was a valid
        # value until round 4 and a typo'd backend quietly taking
        # the ~30x-slower XLA path would be a perf trap
        raise ValueError(
            f"unknown backend {backend!r}: must be 'xla', "
            "'pallas' or 'packed' (the ragged backend was removed "
            "-- see ROADMAP.md's probe ledger)")

    bands = []
    for edge, radii in scaleset:
        vox_spec = packing.GridSpec.fit_bounds(s_lo, s_hi, edge)
        if kind == "vector":
            s_cap = tuning.get("vector_s_cap") or _pow2_bucket(
                _voxel_occupancy_cap(search, vox_spec), minimum=8)
            interp_backend = tuning.get("interp_backend", "auto")
            if interp_backend not in ("auto", "gather", "matmul",
                                      "packed"):
                raise ValueError(
                    f"unknown interp_backend {interp_backend!r}")
            if interp_backend == "matmul" or (
                    interp_backend == "auto"
                    and attributes.shape[1] > 8):
                # wide attribute blocks: masked mean as a moment matmul
                centers, center_mask, center_attrs = \
                    interp.interp_to_voxels_matmul(
                        search_dev, s_valid, attrs_dev, vox_spec,
                        int(s_cap), s_lo, s_hi)
            elif interp_backend == "packed" or (
                    interp_backend == "auto" and backend == "packed"
                    and attributes.shape[1] <= 6):
                # (<= 6: wider blocks fall back to the XLA band path,
                # whose serving side keeps the gather interp -- the
                # interp choice must match serving's or fit features
                # drift from served features)
                # the packed backend interpolates through the packed-
                # candidate machinery (the gather interp's 27 x s_cap
                # lanes per center and serial searchsorted measured
                # ~500x the packed step at 1M points on v5e, and its
                # fused serving program crashed the TPU worker) --
                # serving takes the SAME path (pipeline._band_search_
                # prep), so fit features match served features
                ispec, icap = _interp_packed_plan(
                    search, vox_spec, lo, hi, (s_lo, s_hi),
                    tuning.get("query_tile_factor", 3))
                centers, center_mask, center_attrs = \
                    interp.packed_interp(
                        search_dev, s_valid, attrs_dev, vox_spec,
                        ispec, icap)
            else:
                centers, center_mask, center_attrs = \
                    interp.interp_to_voxels(
                        search_dev, s_valid, attrs_dev, vox_spec,
                        int(s_cap))
        else:
            centers, _, center_mask = unique.unique_voxels(
                search_dev, vox_spec, valid=s_valid)
            center_attrs = None
        # the packed kernel computes SAZO natively (masked max/min dz
        # folded into the slabs) and carries up to 6 attribute columns
        # through the moment dot (V_MSO); the span kernel does neither
        use_packed = backend == "packed" and (
            kind != "vector" or attributes.shape[1] <= 6)
        use_spans = (backend == "pallas"
                     and kind not in ("vector", "sazo"))
        spec = device_grid.make_spec(
            lo, hi, max(radii), n_query=q_bucket,
            m=tuning.get("query_tile_factor", 3),
            q_cap=tuning.get("query_capacity")
            or (256 if (use_spans or use_packed) else 128),
            voxel_edge=edge,
            entry_batch=tuning.get("entry_batch", 256),
            x_seg=tuning.get("x_seg", 32)
            if (use_spans or use_packed) else 1)
        if tuning.get("estimate_entries", True):
            # trim dead entries: e_cap from measured occupancy (one
            # native host pass) instead of the worst-case grid bound
            spec = device_grid.with_entry_estimate(spec, query)
        if use_spans or use_packed:
            import jax
            # span-kernel moment-dot precision: "highest" (6-pass f32)
            # or "bf16x2" (2-pass hi+lo split; counts stay exact).  The
            # XLA names "mixed"/"high" map onto the bf16-based option.
            span_prec = {"highest": "highest", "bf16x2": "bf16x2",
                         "mixed": "bf16x2", "high": "bf16x2"}.get(
                tuning.get("precision", "highest"), "highest")
            interpret = jax.default_backend() not in ("tpu", "axon")
        if use_packed:
            # candidate capacity: explicit tuning wins; otherwise size
            # it HOST-side (ops.span_host) -- a device readback here
            # would permanently degrade relay-attached processes that
            # go on to serve (CLAUDE.md transfer discipline)
            if tuning.get("candidate_cap"):
                cap = tuning["candidate_cap"]
            else:
                from nimrud_tpu.ops import span_host
                cap = span_host.candidate_cap(
                    query,
                    _host_unique_voxels(search, edge, bounds=bounds),
                    spec)
            bands.append(device_grid.fused_extract_packed(
                query_dev, q_valid, centers, center_mask, spec, radii,
                kind,
                None if exclude_radius is None else float(exclude_radius),
                n_query, int(cap), interpret,
                tuning.get("span_batch", 8), span_prec,
                attributes=center_attrs))
        elif use_spans:
            bands.append(device_grid.fused_extract_spans(
                query_dev, q_valid, centers, center_mask, spec, radii,
                kind,
                None if exclude_radius is None else float(exclude_radius),
                n_query, interpret,
                tuning.get("span_batch", 8), span_prec))
        else:
            bands.append(device_grid.fused_extract(
                query_dev, q_valid, centers, center_mask, spec, radii,
                kind,
                None if exclude_radius is None
                else float(exclude_radius),
                "highest" if tuning.get("precision") == "bf16x2"
                else tuning.get("precision", "highest"), n_query,
                attributes=center_attrs))
    return bands[0] if len(bands) == 1 else jnp.concatenate(bands, axis=1)


def plan_report(query, search, scaleset, *, method="tiled", tuning=None):
    """
    Per-band static-plan occupancy report -- no kernels run.  For each
    ``(edge, radii)`` band, how full the fixed-capacity tables actually
    are under the given tuning:

      entry_fill:  live entries / entry capacity (dead entries still
                   cost kernel batches -- low fill means wasted MXU
                   passes);
      q_slot_fill: valid queries / (live entries x q_cap) (how full the
                   per-entry query slots are);
      q_cap / s_cap / e_cap: the static capacities themselves.

    ``method`` is "tiled" (host-built plan) or "fused" (device-resident
    plan; fill estimated with the native host pass).  Surfaced through
    ``nimrud sweep`` so capacity tuning is informed by occupancy, not
    guesswork.
    """
    tuning = tuning or {}
    query = np.asarray(query, dtype=np.float32)[:, :3]
    search = np.asarray(search, dtype=np.float32)[:, :3]
    scaleset = [(float(edge), tuple(float(r) for r in radii))
                for edge, radii in scaleset]
    report = []
    if method == "fused":
        from nimrud_tpu.ops import device_grid
        lo = np.minimum(query.min(0), search.min(0)).astype(np.float64)
        hi = np.maximum(query.max(0), search.max(0)).astype(np.float64)
        q_bucket = _pow2_bucket(query.shape[0])
        for edge, radii in scaleset:
            if edge <= 0:
                raise ValueError("fused plan needs voxel edges > 0")
            # resolve the backend exactly like extract_scaleset does
            # (default: packed on real TPU, xla elsewhere) so the
            # report describes the plan the extraction actually runs
            backend = tuning.get("backend")
            if backend is None:
                import jax
                backend = "packed" \
                    if jax.default_backend() in ("tpu", "axon") else "xla"
            use_kernel = backend in ("pallas", "packed")
            spec = device_grid.make_spec(
                lo, hi, max(radii), n_query=q_bucket,
                m=tuning.get("query_tile_factor", 3),
                q_cap=tuning.get("query_capacity")
                or (256 if use_kernel else 128),
                voxel_edge=edge,
                entry_batch=tuning.get("entry_batch", 256),
                x_seg=tuning.get("x_seg", 32) if use_kernel else 1)
            worst = spec.e_cap
            if tuning.get("estimate_entries", True):
                spec = device_grid.with_entry_estimate(spec, query)
            live = device_grid.estimate_entries(query, spec)
            report.append({
                "edge": edge, "e_cap": spec.e_cap,
                "e_cap_worst_case": worst, "entries_live": live,
                "entry_fill": round(live / max(spec.e_cap, 1), 4),
                "q_slot_fill": round(
                    query.shape[0] / max(live * spec.q_cap, 1), 4),
                "q_cap": spec.q_cap, "s_cap": spec.s_cap})
    else:
        for edge, radii in scaleset:
            centers = voxel_downsample(search, edge)[0] if edge > 0 \
                else search
            problem = grid.build_tiled_problem(
                query, centers, tile_edge=max(radii),
                query_tile_factor=tuning.get("query_tile_factor", 3),
                query_capacity=tuning.get("query_capacity"),
                entry_batch=tuning.get("entry_batch", 256))
            stats = problem.stats
            report.append({
                "edge": edge, "e_cap": problem.n_entries,
                "entries_live": stats["entries"],
                "entry_fill": round(
                    stats["entries"] / max(problem.n_entries, 1), 4),
                "q_slot_fill": round(stats["fill"], 4),
                "q_cap": stats["q_cap"], "s_cap": stats["s_cap"]})
    return report


def extract_scaleset(query, search, scaleset, kind="geometric", *,
                     attributes=None, exclude_radius=None,
                     chunk_size=1024, sort_queries=True, method="auto",
                     tuning=None, bounds=None):
    """
    Multiscale features for every query point.

    Args:
      query:     (N, >=3) array; only XYZ is used.
      search:    (M, >=3) array; only XYZ is used.
      scaleset:  sequence of ``(voxel_edge, radii)`` bands.  ``voxel_edge``
                 of 0 skips downsampling for that band.  Radii are
                 processed in the given order (the reference uses
                 descending).
      kind:      one of minimal / geometric / oriented / covariance /
                 vector (see nimrud_tpu.features.layouts).
      attributes: (M, A) per-search-point attribute vectors, required for
                 kind="vector".
      exclude_radius: drop search points closer than this to the query
                 (legacy self-exclusion semantics).
      chunk_size: query rows per kernel step (auto-shrunk for big bands).
      sort_queries: process queries in voxel-key order for fp32 locality
                 (output order is always the caller's).
      method:    "dense" (O(N*S) masked matmuls), "tiled" (voxel hash
                 grid, O(27 * tile occupancy) per query), or "auto"
                 (tiled once the band's search set is large).

    Returns:
      (N, total_width) float32 feature array aligned with ``query``
      (NumPy; use :func:`extract_scaleset_device` to keep the result on
      device for a downstream classifier).
    """
    return np.asarray(extract_scaleset_device(
        query, search, scaleset, kind,
        attributes=attributes, exclude_radius=exclude_radius,
        chunk_size=chunk_size, sort_queries=sort_queries, method=method,
        tuning=tuning, bounds=bounds))


def extract_scaleset_device(query, search, scaleset, kind="geometric", *,
                            attributes=None, exclude_radius=None,
                            chunk_size=1024, sort_queries=True,
                            method="auto", tuning=None, bounds=None):
    """As :func:`extract_scaleset`, but returns a device array.

    ``bounds``: explicit (lo, hi) grid anchor for voxelization and the
    fused grids -- fixed-``bounds`` models pass theirs so TRAINING
    features are extracted on exactly the serving grids.

    ``tuning`` optionally overrides tiled-path parameters:
    query_tile_factor, query_capacity, entry_batch, precision
    ("highest" / "high" / "default").
    """
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}, got {kind!r}")
    if kind == "vector" and attributes is None:
        raise ValueError("kind='vector' requires attributes")
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    chunk_size = _pow2_bucket(chunk_size, minimum=64)
    tuning = tuning or {}

    # prefer the fully device-resident path for large clouds when its
    # requirements hold (geometry layouts, voxelized bands, key budget)
    if method == "fused" or (
            method == "auto"
            and np.asarray(search).shape[0] >= TILED_THRESHOLD
            and all(edge > 0 for edge, _ in scaleset)):
        try:
            return extract_scaleset_fused(
                query, search, scaleset, kind,
                attributes=attributes, exclude_radius=exclude_radius,
                tuning=tuning, bounds=bounds)
        except ValueError:
            if method == "fused":
                raise

    query = np.asarray(query, dtype=np.float32)[:, :3]
    search = np.asarray(search, dtype=np.float32)[:, :3]
    n_query = query.shape[0]
    scaleset = [(float(edge), tuple(float(r) for r in radii))
                for edge, radii in scaleset]

    # the tiled path groups queries by tile itself; the voxel-key
    # pre-sort only helps dense-path chunk locality
    if method == "tiled" or (
            method == "auto" and search.shape[0] >= TILED_THRESHOLD):
        sort_queries = False

    order = None
    if sort_queries and n_query > 1:
        finest = min(edge for edge, _ in scaleset if edge > 0) \
            if any(edge > 0 for edge, _ in scaleset) \
            else min(min(radii) for _, radii in scaleset)
        vf = VoxelFilter(query.astype(np.float64), max(finest, 1e-6))
        order = np.argsort(
            vf.coordinate_to_address(query.astype(np.float64)),
            kind="stable")
        query = query[order]

    q_bucket = max(
        ((n_query + chunk_size - 1) // chunk_size) * chunk_size, chunk_size)
    query_padded = _pad_rows_f32(query, q_bucket)

    bands = [
        _band_features(query_padded, n_query, search, kind, edge, radii,
                       attributes, exclude_radius, chunk_size, method,
                       tuning, bounds=bounds)
        for edge, radii in scaleset
    ]
    features = bands[0] if len(bands) == 1 \
        else jnp.concatenate(bands, axis=1)

    if order is not None:
        inverse = np.empty_like(order)
        inverse[order] = np.arange(n_query)
        features = jnp.take(features, jnp.asarray(inverse), axis=0)
    return features
