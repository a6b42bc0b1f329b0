"""
Multi-chip execution: slab-sharded feature extraction with ICI halo
exchange, and data-parallel classifier training.

Design (TPU-native; the reference is single-process single-GPU, SURVEY.md
section 2g): the cloud is sorted along one axis and split into per-device
slabs (:mod:`nimrud_tpu.parallel.tiles`).  Under ``shard_map`` each device

  1. slices its slab's boundary bands (contiguous rows, because slabs are
     pre-sorted along the slab axis),
  2. exchanges them with its lattice neighbors over ICI via two
     ``ppermute`` shifts (ends masked -- the lattice is a line, not a
     ring),
  3. computes masked-moment features for its own points against
     slab + halos,
  4. (training) takes a softmax-classifier gradient on its shard and
     ``psum``-averages it across the mesh -- pure data parallelism for
     the (tiny) classifier parameters.

Halo correctness is exactly the reference's buffered-region semantics:
with buffer_radius >= the largest analysis radius, features computed this
way are identical to a single-device run over the whole cloud.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nimrud_tpu.features import layouts
from nimrud_tpu.learning import linear
from nimrud_tpu.ops import moments
from nimrud_tpu.parallel import tiles

AXIS = "shards"


def make_mesh(n_devices=None):
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (AXIS,))


def _halo_exchange(slab, valid, halo):
    """
    Exchange boundary bands with lattice neighbors over ICI.  Returns the
    local search set: [own slab, band from left neighbor, band from right
    neighbor] with a validity mask (line topology: the wrap-around bands
    at the two ends are masked out).
    """
    index = jax.lax.axis_index(AXIS)
    n_shards = jax.lax.axis_size(AXIS)

    # slabs are sorted along the slab axis, so boundary bands are slices
    low_band, low_valid = slab[:halo], valid[:halo]
    high_band, high_valid = slab[-halo:], valid[-halo:]

    shift_right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    shift_left = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    # from the left neighbor: its high band moves right
    from_left = jax.lax.ppermute(high_band, AXIS, shift_right)
    from_left_valid = jax.lax.ppermute(high_valid, AXIS, shift_right)
    # from the right neighbor: its low band moves left
    from_right = jax.lax.ppermute(low_band, AXIS, shift_left)
    from_right_valid = jax.lax.ppermute(low_valid, AXIS, shift_left)

    from_left_valid = from_left_valid & (index > 0)
    from_right_valid = from_right_valid & (index < n_shards - 1)

    search = jnp.concatenate([slab, from_left, from_right], axis=0)
    search_valid = jnp.concatenate(
        [valid, from_left_valid, from_right_valid], axis=0)
    return search, search_valid


def _shard_features(slab, valid, halo, radii, kind, chunk_size,
                    exclude_radius):
    """Per-device body: halo exchange + masked-moment features."""
    search, search_valid = _halo_exchange(slab, valid, halo)

    got = {}
    n = slab.shape[0]
    pad = (-n) % chunk_size
    query = jnp.concatenate(
        [slab, jnp.zeros((pad, 3), slab.dtype)], axis=0) if pad else slab
    chunks = query.reshape(-1, chunk_size, 3)

    def body(chunk):
        return moments.chunk_moments(
            chunk, search, search_valid, radii,
            exclude_radius=exclude_radius)

    stacked = jax.lax.map(body, chunks)
    got = {key: value.reshape((query.shape[0],) + value.shape[2:])[:n]
           for key, value in stacked.items()}

    blocks = []
    for ri, radius in enumerate(radii):
        blocks.append(layouts.build_block(
            kind, got["count"][:, ri], got["mean"][:, ri],
            got["cov"][:, ri], slab, float(radius)))
    return jnp.concatenate(blocks, axis=-1)


def sharded_extract(mesh, slabs, valid, halo, radii, kind="minimal", *,
                    chunk_size=256, exclude_radius=None):
    """
    Multi-chip feature extraction.  ``slabs``/``valid`` come from
    :func:`nimrud_tpu.parallel.tiles.shard_cloud`.  Returns per-device
    feature blocks (n_devices, rows, width).
    """
    radii = tuple(float(r) for r in radii)

    @functools.partial(jax.jit, static_argnames=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS))
    def run(slabs, valid):
        feats = _shard_features(
            slabs[0], valid[0], halo, radii, kind, chunk_size,
            exclude_radius)
        return feats[None]

    return run(jnp.asarray(slabs), jnp.asarray(valid))


def make_train_step(mesh, halo, radii, kind, n_classes, optimizer, *,
                    chunk_size=256, exclude_radius=None, weight_decay=0.0):
    """
    Build a jitted multi-chip training step:

      (params, opt_state, slabs, valid, labels) -> (params, opt_state, loss)

    Each device extracts features for its slab (with ICI halo exchange),
    computes the softmax-classifier loss on its points, and gradients are
    psum-averaged across the mesh.  Parameters are replicated.
    """
    radii = tuple(float(r) for r in radii)

    def device_loss(params, slab, valid, labels):
        feats = _shard_features(
            slab, valid, halo, radii, kind, chunk_size, exclude_radius)
        logits = linear.predict_logits(params, feats)
        log_probs = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
        weight = valid.astype(jnp.float32)
        loss = jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        if weight_decay:
            loss = loss + weight_decay * jnp.sum(params["w"] ** 2)
        return loss

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def step(params, opt_state, slabs, valid, labels):
        loss, grads = jax.value_and_grad(device_loss)(
            params, slabs[0], valid[0], labels[0])
        grads = jax.lax.pmean(grads, AXIS)
        loss = jax.lax.pmean(loss, AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def make_fused_extract(mesh, halo, scaleset, kind, bounds_lo, bounds_hi,
                       rows, *, precision="highest"):
    """
    Build a jitted multi-chip FUSED extraction: each device voxelizes its
    slab + ICI-exchanged halos on a globally anchored grid, builds its
    tile tables on device, and runs the masked-moment kernel -- the whole
    flagship pipeline under shard_map.

    Args:
      halo / scaleset / kind: as elsewhere.
      bounds_lo/hi: GLOBAL cloud bounds (so every shard bins into the
        same grid and per-shard voxelization equals the global one).
      rows: slab row count (static).

    Returns f(slabs, valid) -> (n_devices, rows, width).
    """
    from nimrud_tpu.ops import device_grid, packing, unique

    specs = []
    for edge, radii in scaleset:
        if edge <= 0:
            raise ValueError("fused multi-chip extraction needs "
                             "voxelized bands (edge > 0)")
        radii = tuple(float(r) for r in radii)
        vox_spec = packing.GridSpec.fit_bounds(bounds_lo, bounds_hi, edge)
        dev_spec = device_grid.make_spec(
            bounds_lo, bounds_hi, max(radii), n_query=rows,
            voxel_edge=edge)
        specs.append((vox_spec, dev_spec, radii))
    specs = tuple(specs)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS))
    def run(slabs, valid):
        slab, v = slabs[0], valid[0]
        search, s_valid = _halo_exchange(slab, v, halo)
        bands = []
        for vox_spec, dev_spec, radii in specs:
            centers, _, mask = unique.unique_voxels(
                search, vox_spec, valid=s_valid)
            bands.append(device_grid.fused_extract.__wrapped__(
                slab, v, centers, mask, dev_spec, radii, kind,
                None, precision, rows))
        feats = bands[0] if len(bands) == 1 \
            else jnp.concatenate(bands, axis=1)
        return feats[None]

    return run


AXIS_X, AXIS_Y = "mesh_x", "mesh_y"


def make_mesh_2d(shape, devices=None):
    """(mx, my) device mesh for 2-D spatial sharding."""
    if devices is None:
        devices = jax.devices()
    mx, my = int(shape[0]), int(shape[1])
    if mx * my > len(devices):
        raise ValueError(
            f"mesh {mx}x{my} needs {mx * my} devices, "
            f"have {len(devices)}")
    return Mesh(np.asarray(devices[:mx * my]).reshape(mx, my),
                (AXIS_X, AXIS_Y))


def _band_by_value(points, valid, axis, k, largest):
    """Fixed-capacity boundary band selected by coordinate VALUE (works
    for any intra-block ordering): the k most extreme valid points."""
    coords = points[:, axis]
    big = jnp.float32(3e38)
    score = jnp.where(valid, coords, -big) if largest \
        else jnp.where(valid, -coords, -big)
    _, idx = jax.lax.top_k(score, k)
    return points[idx], valid[idx]


def _halo_bands_2d(block, valid, halo_x, halo_y):
    """
    Two-phase halo exchange on the (AXIS_X, AXIS_Y) mesh: x-face bands
    first, then y-face bands of the augmented set (own + x halos), so
    corner regions ride the second phase.  Returns the received halo
    points and validity ONLY (the caller owns its block), enabling
    overlap of the exchange with local compute.
    """
    ix = jax.lax.axis_index(AXIS_X)
    nx = jax.lax.axis_size(AXIS_X)
    iy = jax.lax.axis_index(AXIS_Y)
    ny = jax.lax.axis_size(AXIS_Y)

    right = [(i, (i + 1) % nx) for i in range(nx)]
    left = [(i, (i - 1) % nx) for i in range(nx)]
    low_x, low_xv = _band_by_value(block, valid, 0, halo_x, largest=False)
    high_x, high_xv = _band_by_value(block, valid, 0, halo_x, largest=True)
    from_left = jax.lax.ppermute(high_x, AXIS_X, right)
    from_left_v = jax.lax.ppermute(high_xv, AXIS_X, right) & (ix > 0)
    from_right = jax.lax.ppermute(low_x, AXIS_X, left)
    from_right_v = jax.lax.ppermute(low_xv, AXIS_X, left) & (ix < nx - 1)

    aug = jnp.concatenate([block, from_left, from_right], axis=0)
    aug_v = jnp.concatenate([valid, from_left_v, from_right_v], axis=0)

    up = [(j, (j + 1) % ny) for j in range(ny)]
    down = [(j, (j - 1) % ny) for j in range(ny)]
    low_y, low_yv = _band_by_value(aug, aug_v, 1, halo_y, largest=False)
    high_y, high_yv = _band_by_value(aug, aug_v, 1, halo_y, largest=True)
    from_below = jax.lax.ppermute(high_y, AXIS_Y, up)
    from_below_v = jax.lax.ppermute(high_yv, AXIS_Y, up) & (iy > 0)
    from_above = jax.lax.ppermute(low_y, AXIS_Y, down)
    from_above_v = jax.lax.ppermute(low_yv, AXIS_Y, down) & (iy < ny - 1)

    halo_pts = jnp.concatenate(
        [from_left, from_right, from_below, from_above], axis=0)
    halo_valid = jnp.concatenate(
        [from_left_v, from_right_v, from_below_v, from_above_v], axis=0)
    return halo_pts, halo_valid


def _outer6(delta):
    dx, dy, dz = delta[..., 0], delta[..., 1], delta[..., 2]
    return jnp.stack(
        [dx * dx, dx * dy, dx * dz, dy * dy, dy * dz, dz * dz], axis=-1)


def _combine_moment_groups(groups):
    """
    Merge per-group neighborhood statistics over DISJOINT search groups
    (parallel-axis theorem on the packed covariance).  This is what lets
    the local-group moments compute while the halo ppermutes are in
    flight: moments are additive, so local and halo contributions
    combine exactly afterwards.
    """
    count = sum(g["count"] for g in groups)
    denom = jnp.maximum(count, 1.0)
    mean = sum(
        g["count"][..., None] * g["mean"] for g in groups
    ) / denom[..., None]
    cov = sum(
        g["count"][..., None]
        * (g["cov"] + _outer6(g["mean"] - mean))
        for g in groups
    ) / denom[..., None]
    out = {"count": count, "mean": mean, "cov": cov}
    if "sazo" in groups[0]:
        sazo = groups[0]["sazo"]
        for g in groups[1:]:
            take = jnp.abs(g["sazo"]) > jnp.abs(sazo)
            sazo = jnp.where(take, g["sazo"], sazo)
        out["sazo"] = sazo
    return out


def _chunked_moments(query, search, search_valid, radii, chunk_size,
                     exclude_radius, with_sazo):
    n = query.shape[0]
    pad = (-n) % chunk_size
    padded = jnp.concatenate(
        [query, jnp.zeros((pad, 3), query.dtype)], axis=0) if pad \
        else query
    chunks = padded.reshape(-1, chunk_size, 3)

    def body(chunk):
        return moments.chunk_moments(
            chunk, search, search_valid, radii,
            exclude_radius=exclude_radius, with_sazo=with_sazo)

    stacked = jax.lax.map(body, chunks)
    return {key: value.reshape((padded.shape[0],) + value.shape[2:])[:n]
            for key, value in stacked.items()}


def sharded_extract_2d(mesh, blocks, valid, halo_x, halo_y, radii,
                       kind="minimal", *, chunk_size=256,
                       exclude_radius=None):
    """
    2-D mesh feature extraction with halo/compute overlap: each device
    starts its x/y halo ppermutes, computes moments against its OWN
    block while they fly, then adds the halo group's moments (additive
    decomposition).  ``blocks``/``valid`` from
    :func:`nimrud_tpu.parallel.tiles.shard_cloud_2d`, device-major.
    Returns (n_devices, rows, width).
    """
    radii = tuple(float(r) for r in radii)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P((AXIS_X, AXIS_Y)), P((AXIS_X, AXIS_Y))),
        out_specs=P((AXIS_X, AXIS_Y)))
    def run(blocks, valid):
        # the exchange is issued first inside _features_2d; the local-
        # group moments have no data dependency on it, so XLA overlaps
        # the ppermutes with them
        return _features_2d(
            blocks[0], valid[0], halo_x, halo_y, radii, kind,
            chunk_size, exclude_radius)[None]

    return run(jnp.asarray(blocks), jnp.asarray(valid))


def _features_2d(block, valid, halo_x, halo_y, radii, kind, chunk_size,
                 exclude_radius):
    """Per-device 2-D body: overlapped halo exchange + moment combine."""
    with_sazo = layouts.needs_sazo(kind)
    halo_pts, halo_valid = _halo_bands_2d(block, valid, halo_x, halo_y)
    own = _chunked_moments(
        block, block, valid, radii, chunk_size, exclude_radius,
        with_sazo)
    halo = _chunked_moments(
        block, halo_pts, halo_valid, radii, chunk_size, exclude_radius,
        with_sazo)
    got = _combine_moment_groups([own, halo])
    blocks_out = []
    for ri, radius in enumerate(radii):
        blocks_out.append(layouts.build_block(
            kind, got["count"][:, ri], got["mean"][:, ri],
            got["cov"][:, ri], block, float(radius),
            sazo=got["sazo"][:, ri] if with_sazo else None))
    return jnp.concatenate(blocks_out, axis=-1)


def make_train_step_2d(mesh, halo_x, halo_y, radii, kind, n_classes,
                       optimizer, *, chunk_size=256, exclude_radius=None,
                       weight_decay=0.0):
    """
    Jitted training step on the 2-D tile mesh: per-device feature
    extraction (two-phase halo exchange overlapped with local moments),
    softmax loss on the device's points, gradients pmean-averaged over
    BOTH mesh axes.  Signature mirrors :func:`make_train_step`.
    """
    radii = tuple(float(r) for r in radii)

    def device_loss(params, block, valid, labels):
        feats = _features_2d(
            block, valid, halo_x, halo_y, radii, kind, chunk_size,
            exclude_radius)
        logits = linear.predict_logits(params, feats)
        log_probs = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
        weight = valid.astype(jnp.float32)
        loss = jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        if weight_decay:
            loss = loss + weight_decay * jnp.sum(params["w"] ** 2)
        return loss

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P((AXIS_X, AXIS_Y)), P((AXIS_X, AXIS_Y)),
                  P((AXIS_X, AXIS_Y))),
        out_specs=(P(), P(), P()),
        check_vma=False)
    def step(params, opt_state, blocks, valid, labels):
        loss, grads = jax.value_and_grad(device_loss)(
            params, blocks[0], valid[0], labels[0])
        grads = jax.lax.pmean(grads, (AXIS_X, AXIS_Y))
        loss = jax.lax.pmean(loss, (AXIS_X, AXIS_Y))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def make_fused_extract_2d(mesh, halo_x, halo_y, scaleset, kind,
                          bounds_lo, bounds_hi, rows, *,
                          precision="highest"):
    """
    The flagship fused pipeline on the 2-D tile mesh: each device runs
    the two-phase halo exchange, voxelizes its block + halos on the
    globally anchored grid, builds its tile tables on device, and runs
    the masked-moment kernel -- all under one shard_map.

    Args mirror :func:`make_fused_extract` (1-D variant); ``rows`` is
    the per-device block row count.  Returns
    f(blocks, valid) -> (n_devices, rows, width), device-major.
    """
    from nimrud_tpu.ops import device_grid, packing, unique

    specs = []
    for edge, radii in scaleset:
        if edge <= 0:
            raise ValueError("fused multi-chip extraction needs "
                             "voxelized bands (edge > 0)")
        radii = tuple(float(r) for r in radii)
        vox_spec = packing.GridSpec.fit_bounds(bounds_lo, bounds_hi, edge)
        dev_spec = device_grid.make_spec(
            bounds_lo, bounds_hi, max(radii), n_query=rows,
            voxel_edge=edge)
        specs.append((vox_spec, dev_spec, radii))
    specs = tuple(specs)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P((AXIS_X, AXIS_Y)), P((AXIS_X, AXIS_Y))),
        out_specs=P((AXIS_X, AXIS_Y)))
    def run(blocks, valid):
        block, v = blocks[0], valid[0]
        halo_pts, halo_valid = _halo_bands_2d(block, v, halo_x, halo_y)
        search = jnp.concatenate([block, halo_pts], axis=0)
        s_valid = jnp.concatenate([v, halo_valid], axis=0)
        bands = []
        for vox_spec, dev_spec, radii in specs:
            centers, _, mask = unique.unique_voxels(
                search, vox_spec, valid=s_valid)
            bands.append(device_grid.fused_extract.__wrapped__(
                block, v, centers, mask, dev_spec, radii, kind,
                None, precision, rows))
        feats = bands[0] if len(bands) == 1 \
            else jnp.concatenate(bands, axis=1)
        return feats[None]

    return run


def make_fused_predict_2d(mesh, halo_x, halo_y, scaleset, kind,
                          bounds_lo, bounds_hi, rows, clf_kind,
                          clf_params, clf_static=None, *,
                          precision="highest", backend="xla",
                          c_caps=None, n_attr=0, vector_s_cap=32,
                          interp_plans=None):
    """
    Multi-chip SERVING: the whole production inference step -- two-phase
    halo exchange, device voxelize, tile build, masked moments, feature
    layout, classifier -- under one shard_map on the 2-D tile mesh.
    Classifier parameters are replicated (they are tiny); points and all
    intermediate tables stay sharded.

    ``clf_kind``/``clf_params``/``clf_static`` come from
    :meth:`nimrud_tpu.pipeline.GeometryClassifier._fused_classifier`.
    ``backend="packed"`` runs each shard's bands through the
    shared-query-plan packed kernel (the single-chip production
    backend; requires static per-band ``c_caps``, sized host-side with
    ops.span_host.candidate_cap(segment_wide=True) so they bound any
    shard's query packing); ``backend="pallas"`` uses the streaming
    span-DMA kernel; anything else the XLA candidate-table path.

    ``kind="vector"`` (the V_MSO path, reference
    nimrud/prototypes/mso.py:12-98): blocks carry ``n_attr`` attribute
    columns after XYZ (shard with the attributes hstacked so the halo
    exchange moves them with their points); each shard interpolates the
    attributes onto its voxel centers (Chebyshev masked mean,
    ``vector_s_cap`` points per voxel) and the packed kernel computes
    the per-radius attribute means natively (n_attr <= 6).
    ``interp_plans`` (packed vector only): per-band ``(ispec, icap)``
    tuples from multiscale._interp_packed_plan(segment_wide=True) route
    each shard's interpolation through the PACKED candidate machinery
    -- the gather interp it replaces moves 27 x s_cap lanes per center
    through serial-searchsorted tables and crashed the TPU worker at
    production shard sizes (ROADMAP round 5); without plans the shard
    program keeps the gather interp (test-size fallback).

    Returns f(blocks, valid) -> ((n_devices, rows) int32 labels,
    (n_devices,) int32 per-shard overflow counts), device-major
    (reassemble with :func:`nimrud_tpu.parallel.tiles.unshard`).
    """
    from nimrud_tpu.features import layouts
    from nimrud_tpu.ops import device_grid, packing, unique
    from nimrud_tpu.pipeline import _FusedReducer, classify_features

    if kind == "vector" and not n_attr:
        raise ValueError("kind='vector' needs n_attr attribute columns")
    vec_packed = kind == "vector" and n_attr <= 6
    use_packed = (backend == "packed" and c_caps is not None
                  and (kind != "vector" or vec_packed))
    use_spans = (backend == "pallas" and kind != "vector"
                 and not layouts.needs_sazo(kind))
    specs = []
    for edge, radii in scaleset:
        if edge <= 0:
            raise ValueError("fused multi-chip serving needs "
                             "voxelized bands (edge > 0)")
        radii = tuple(float(r) for r in radii)
        vox_spec = packing.GridSpec.fit_bounds(bounds_lo, bounds_hi, edge)
        dev_spec = device_grid.make_spec(
            bounds_lo, bounds_hi, max(radii), n_query=rows,
            voxel_edge=edge,
            q_cap=256 if use_packed else (1024 if use_spans else 128),
            x_seg=32 if use_packed else (64 if use_spans else 1))
        specs.append((vox_spec, dev_spec, radii))
    specs = tuple(specs)
    span_prec = {"bf16x2": "bf16x2", "mixed": "bf16x2",
                 "high": "bf16x2"}.get(precision, "highest")
    xla_prec = "highest" if precision == "bf16x2" else precision
    interpret = jax.default_backend() not in ("tpu", "axon")
    if use_packed:
        c_caps = tuple(int(c) for c in c_caps)
        pack_spec = min((s[1] for s in specs), key=lambda s: s.tile_edge)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P((AXIS_X, AXIS_Y)), P((AXIS_X, AXIS_Y))),
        out_specs=(P((AXIS_X, AXIS_Y)), P((AXIS_X, AXIS_Y))),
        # the rpte walk scans a replicated carry over sharded features;
        # vma inference rejects that mix (as in make_train_step)
        check_vma=False)
    def run(blocks, valid):
        block_full, v = blocks[0], valid[0]
        # attribute columns ride the halo exchange with their points
        # (the band selection is row-wise, so extra columns are free)
        halo_full, halo_valid = _halo_bands_2d(
            block_full, v, halo_x, halo_y)
        block = block_full[:, :3]
        search_full = jnp.concatenate([block_full, halo_full], axis=0)
        s_valid = jnp.concatenate([v, halo_valid], axis=0)
        search = search_full[:, :3]
        s_attr = search_full[:, 3:] if kind == "vector" else None
        dropped = jnp.zeros((), jnp.int32)
        if use_packed:
            centers, masks, cattrs = [], [], []
            for bi, (vox_spec, dev_spec, _) in enumerate(specs):
                if kind == "vector":
                    # V_MSO: interpolate shard attributes onto the
                    # voxel centers (attrs then ride the band sort
                    # into the packed kernel's attribute rows)
                    from nimrud_tpu.ops import interp
                    if interp_plans is not None:
                        isp, icap = interp_plans[bi]
                        c, mk, ca, ist = interp.packed_interp(
                            search, s_valid, s_attr, vox_spec, isp,
                            icap, with_stats=True, inner_jit=True)
                    else:
                        c, mk, ca, ist = \
                            interp.interp_to_voxels.__wrapped__(
                                search, s_valid, s_attr, vox_spec,
                                vector_s_cap, with_stats=True)
                    dropped = dropped + ist["dropped_search"]
                    cattrs.append(ca)
                else:
                    # compaction sort ordered by the band's fine tile
                    # id so the extract skips its per-band search sort
                    # (same bit-identical trick as single-chip serving;
                    # see unique.unique_voxels)
                    c, _, mk = unique.unique_voxels(
                        search, vox_spec, valid=s_valid,
                        tile_spec=dev_spec)
                    cattrs.append(None)
                centers.append(c)
                masks.append(mk)
            # same structure as single-chip serving: classify in
            # (entry, slot) order INSIDE the extract program and unsort
            # only the int32 labels (in-program rank compaction + one
            # key-value sort) instead of the full feature width per
            # shard
            reducer = _FusedReducer(clf_kind, clf_static, False)
            (out_rank, q_order), st = \
                device_grid.fused_extract_packed_multi.__wrapped__(
                    block, v, tuple(centers), tuple(masks), pack_spec,
                    tuple(s[1] for s in specs),
                    tuple(s[2] for s in specs), kind, None, rows,
                    c_caps, interpret, 8, span_prec, with_stats=True,
                    order="rank", reduce_fn=reducer,
                    reduce_args=clf_params,
                    attributes=tuple(cattrs),
                    presorted=kind != "vector")
            dropped = dropped + st["dropped_candidates"]
            _, labels = jax.lax.sort_key_val(q_order, out_rank[0])
            return labels[:rows][None], dropped[None]
        else:
            bands = []
            for vox_spec, dev_spec, radii in specs:
                if kind == "vector":
                    from nimrud_tpu.ops import interp
                    cs, mask, ca, ist = \
                        interp.interp_to_voxels.__wrapped__(
                            search, s_valid, s_attr, vox_spec,
                            vector_s_cap, with_stats=True)
                    dropped = dropped + ist["dropped_search"]
                    bands.append(device_grid.fused_extract.__wrapped__(
                        block, v, cs, mask, dev_spec, radii, kind,
                        None, xla_prec, rows, attributes=ca))
                    continue
                cs, _, mask = unique.unique_voxels(
                    search, vox_spec, valid=s_valid)
                if use_spans:
                    bands.append(
                        device_grid.fused_extract_spans.__wrapped__(
                            block, v, cs, mask, dev_spec, radii, kind,
                            None, rows, interpret, 8, span_prec))
                else:
                    bands.append(device_grid.fused_extract.__wrapped__(
                        block, v, cs, mask, dev_spec, radii, kind,
                        None, xla_prec, rows))
            feats = bands[0] if len(bands) == 1 \
                else jnp.concatenate(bands, axis=1)
        probs = classify_features(clf_kind, clf_params, clf_static, feats)
        labels = jnp.argmax(probs, axis=1).astype(jnp.int32)
        return labels[None], dropped[None]

    return run


def extract_multichip_2d(points, radii, kind="minimal", *, mesh_shape,
                         mesh=None, buffer_radius=None, chunk_size=256,
                         exclude_radius=None):
    """End-to-end 2-D mesh extraction: shard, extract, reassemble."""
    if buffer_radius is None:
        buffer_radius = max(radii)
    if buffer_radius < max(radii):
        raise ValueError("buffer_radius must be >= the largest radius")
    if mesh is None:
        mesh = make_mesh_2d(mesh_shape)
    shards = tiles.shard_cloud_2d(points, mesh_shape, buffer_radius)
    feats = sharded_extract_2d(
        mesh, shards["blocks"], shards["valid"], shards["halo_x"],
        shards["halo_y"], radii, kind, chunk_size=chunk_size,
        exclude_radius=exclude_radius)
    return tiles.unshard(
        np.asarray(feats), shards["valid"], shards["order"], len(points))


def extract_multichip(points, radii, kind="minimal", *, mesh=None,
                      buffer_radius=None, chunk_size=256,
                      exclude_radius=None):
    """
    Convenience end-to-end: shard a cloud across every available device,
    extract features with halo exchange, reassemble in caller order.
    """
    if mesh is None:
        mesh = make_mesh()
    n_devices = mesh.devices.size
    if buffer_radius is None:
        buffer_radius = max(radii)
    if buffer_radius < max(radii):
        raise ValueError("buffer_radius must be >= the largest radius")

    shards = tiles.shard_cloud(points, n_devices, buffer_radius)
    feats = sharded_extract(
        mesh, shards["slabs"], shards["valid"], shards["halo"],
        radii, kind, chunk_size=chunk_size, exclude_radius=exclude_radius)
    return tiles.unshard(
        np.asarray(feats), shards["valid"], shards["order"], len(points))
