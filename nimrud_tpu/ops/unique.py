"""
Static-shape sort-based unique for voxel keys.

``jnp.unique`` produces data-dependent shapes and cannot live under jit on
TPU.  This module implements the dedup the voxel downsample needs with
fixed shapes: sort, flag segment heads, and scatter the unique keys to the
front of a same-length buffer, returning a count.  Padding uses
``packing.PAD_KEY`` (INT32_MAX), which valid keys can never equal because
the key budget is 30 bits.

TPU-native replacement for the reference's host ``numpy.unique`` dedup
(reference: nimrud/utils/geometry.py:142-156, nimrud/prototypes/ch.py:1576-1699).
"""

import jax
import jax.numpy as jnp

from nimrud_tpu.ops.packing import PAD_KEY


def _sorted_unique_flags(keys, valid=None):
    """Shared dedup step: sort keys (invalid rows forced to PAD_KEY) and
    flag segment heads.  Returns ``(sorted_keys, is_unique)`` where
    ``is_unique`` marks the first occurrence of each live key.  Both
    ``unique_keys`` and the ``tile_spec`` branch of ``unique_voxels``
    build on this so the PAD_KEY semantics live in exactly one place.
    """
    if valid is not None:
        keys = jnp.where(valid, keys, PAD_KEY)
    keys = jnp.sort(keys)
    head = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), keys[1:] != keys[:-1]])
    is_unique = head & (keys != PAD_KEY)
    return keys, is_unique


def unique_keys(keys, valid=None):
    """
    Deduplicate int32 keys under jit.

    Args:
      keys:  (N,) int32, values < 2**30.
      valid: optional (N,) bool; invalid rows are dropped.

    Returns:
      (unique, count): ``unique`` is (N,) int32 with the sorted unique keys
      in the first ``count`` slots and PAD_KEY elsewhere.
    """
    keys, is_unique = _sorted_unique_flags(keys, valid)
    # compact unique keys to the front by masking duplicates to PAD_KEY
    # and re-sorting: a second sort of near-sorted data costs ~1.7 ms/M
    # on v5e where the scatter it replaces costs ~7 ms/M
    # (scripts/probe_datamove.py), and the output is bit-identical
    # (PAD_KEY = INT32_MAX sorts last; survivors keep their order)
    out = jnp.sort(jnp.where(is_unique, keys, PAD_KEY))
    return out, is_unique.sum()


def unique_voxels(points, spec, valid=None, tile_spec=None):
    """
    Voxel-downsample under jit: encode, dedup, decode.

    Returns ``(centers, count, mask)``: (N, dim) voxel centers (sorted by
    key, or by ``tile_spec`` fine-tile id when given; padded rows repeat
    the grid origin), the live count, and the validity mask.

    With ``tile_spec`` (a ``device_grid.DeviceGridSpec``), the
    COMPACTION sort orders survivors by that spec's fine-tile id
    instead of by voxel key, carrying the key as payload -- the output
    then feeds ``device_grid._band_spans(..., presorted=True)`` without
    its own search tile sort (measured ~3.5 ms/step across the three
    bench bands on v5e).  Within a tile the order is still voxel-key
    order (both sorts are stable over a key-sorted input), so every
    downstream span table, candidate order, and feature SUM is
    bit-identical to the unsorted path.
    """
    keys = spec.encode(points)
    if tile_spec is None:
        uniq, count = unique_keys(keys, valid=valid)
        mask = uniq != PAD_KEY
        # decode pads as key 0 so padded rows hold finite coordinates
        centers = spec.decode(jnp.where(mask, uniq, 0))
        return centers, count, mask

    from nimrud_tpu.ops import device_grid
    keys, is_unique = _sorted_unique_flags(keys, valid)
    # fine-tile id of each survivor's center, computed the same way
    # _band_spans computes s_ids (same decode, same _encode), so the
    # compacted order IS the band sort order; duplicates and pads get
    # INT32_MAX and sort past every live tile (n_grid included)
    tid = device_grid._encode(
        spec.decode(jnp.where(keys != PAD_KEY, keys, 0)),
        tile_spec, coarse=False)
    uniq = jax.lax.sort_key_val(
        jnp.where(is_unique, tid, PAD_KEY),
        jnp.where(is_unique, keys, PAD_KEY))[1]
    mask = uniq != PAD_KEY
    centers = spec.decode(jnp.where(mask, uniq, 0))
    return centers, is_unique.sum(), mask
