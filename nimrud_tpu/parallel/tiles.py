"""
Host-side spatial sharding: split a cloud into per-device slabs with
halo-capacity planning.

The reference's buffered-partition semantics (each search region expanded
by the largest analysis scale so tiles process independently --
reference: nimrud/utils/geometry.py:179-253, nimrud/prototypes/
mso.py:908-913) become the multi-chip contract here: each device owns a
contiguous slab of the cloud along one axis, and the boundary points it
must receive from its neighbors are exactly the points within
``buffer_radius`` of the slab face.

The cloud is globally sorted along the slab axis, so each slab's boundary
bands are contiguous rows: the device-side halo exchange is a fixed-size
slice + ppermute, no gathers.
"""

import numpy as np


def shard_cloud(points, n_devices, buffer_radius, *, axis=0,
                extras=None):
    """
    Split ``points`` into ``n_devices`` equal-size slabs along ``axis``.

    Returns a dict with:
      slabs:     (n_devices, rows, 3) float32, rows padded to equal size
                 (padding repeats each slab's last point, marked invalid)
      valid:     (n_devices, rows) bool
      order:     (N,) permutation applied to the cloud (sorted by axis,
                 then slab-partitioned); invert to restore caller order
      halo:      rows needed from each neighbor = max points within
                 buffer_radius of any slab face, padded to a power of two
      extras:    optional list of per-point arrays sharded identically
    """
    points = np.asarray(points, dtype=np.float32)
    n = len(points)
    order = np.argsort(points[:, axis], kind="stable")
    sorted_pts = points[order]

    per = -(-n // n_devices)
    rows = per
    slabs = np.zeros((n_devices, rows, 3), dtype=np.float32)
    valid = np.zeros((n_devices, rows), dtype=bool)
    sharded_extras = None
    if extras is not None:
        extras = [np.asarray(e)[order] for e in extras]
        sharded_extras = [
            np.zeros((n_devices, rows) + e.shape[1:], dtype=e.dtype)
            for e in extras]

    halo_need = 1
    for d in range(n_devices):
        lo, hi = d * per, min((d + 1) * per, n)
        count = hi - lo
        if count > 0:
            slabs[d, :count] = sorted_pts[lo:hi]
            if count < rows:
                slabs[d, count:] = sorted_pts[hi - 1]
            valid[d, :count] = True
            if extras is not None:
                for out, src in zip(sharded_extras, extras):
                    out[d, :count] = src[lo:hi]
        # halo need: points of this slab within buffer of either face
        if count > 0 and n_devices > 1:
            coords = sorted_pts[lo:hi, axis]
            left_face, right_face = coords[0], coords[-1]
            halo_need = max(
                halo_need,
                int((coords <= left_face + buffer_radius).sum()),
                int((coords >= right_face - buffer_radius).sum()))

    halo = 1
    while halo < halo_need:
        halo *= 2
    halo = min(halo, rows)

    return {
        "slabs": slabs,
        "valid": valid,
        "order": order,
        "halo": halo,
        "extras": sharded_extras,
        "axis": axis,
        "buffer_radius": float(buffer_radius),
    }


def unshard(per_device_values, valid, order, n_total):
    """
    Reassemble per-device outputs (n_devices, rows, ...) into caller
    order (n_total, ...).
    """
    flat = per_device_values.reshape(
        (-1,) + per_device_values.shape[2:])[valid.reshape(-1)]
    inverse = np.empty_like(order)
    inverse[order] = np.arange(n_total)
    return flat[inverse]
