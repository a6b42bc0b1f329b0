"""
Device-side voxel key packing.

The host-side :class:`nimrud_tpu.utils.geometry.VoxelFilter` owns the full
64-bit address contract.  On TPU, 64-bit integers are slow and JAX defaults
to 32-bit, so the device path packs per-axis grid coordinates into a single
**int32** key (budget 30 bits, keys strictly below 2**30 so the maximum
int32 doubles as the padding sentinel).  Larger regions are handled above
this layer by spatial tiling, exactly as the reference tiled its 10-bit/axis
GPU voxelizer over coarse cubes (reference: nimrud/prototypes/ch.py:1576-1699,
nimrud/prototypes/mso.py:1152-1310).

All functions here are shape-polymorphic, jit-safe, and dtype-explicit.
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

# keys use at most 30 bits so INT32_MAX is never a valid key
MAX_KEY_BITS = 30
PAD_KEY = np.int32(2**31 - 1)


@dataclass(frozen=True)
class GridSpec:
    """
    Static description of a cubic voxel grid, computed on the host and
    closed over by jitted functions.  Mirrors the VoxelFilter address
    layout: axis 0 in the lowest bits, voxel 0 centered on the region's
    minimum corner (grid origin = min(points) - edge/2).
    """

    origin: tuple          # minimum corner of the grid (voxel 0's low corner)
    edge_length: float
    widths: tuple          # address bits per axis

    @property
    def dim(self):
        return len(self.widths)

    @property
    def shifts(self):
        out = [0]
        for w in self.widths[:-1]:
            out.append(out[-1] + w)
        return tuple(out)

    @property
    def total_bits(self):
        return sum(self.widths)

    @classmethod
    def fit_bounds(cls, lo, hi, edge_length):
        """Build a spec from precomputed bounds (min/max corners)."""
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        origin = lo - edge_length / 2
        span = (hi + edge_length / 2) - origin
        widths = np.maximum(
            np.ceil(np.log2(np.maximum(span / edge_length, 1.0))), 1
        ).astype(int)
        if widths.sum() > MAX_KEY_BITS:
            raise ValueError(
                f"grid needs {int(widths.sum())} key bits "
                f"(device budget {MAX_KEY_BITS}); tile the region first")
        return cls(tuple(float(o) for o in origin), float(edge_length),
                   tuple(int(w) for w in widths))

    @classmethod
    def fit(cls, points, edge_length):
        """
        Build a spec enclosing ``points`` (host-side, float64 math so cell
        boundaries agree with VoxelFilter).  Raises if the region needs
        more than MAX_KEY_BITS -- callers tile space first.
        """
        points = np.asarray(points, dtype=np.float64)
        origin = points.min(0) - edge_length / 2
        span = (points.max(0) + edge_length / 2) - origin
        widths = np.maximum(
            np.ceil(np.log2(np.maximum(span / edge_length, 1.0))), 1
        ).astype(int)
        if widths.sum() > MAX_KEY_BITS:
            raise ValueError(
                f"grid needs {int(widths.sum())} key bits "
                f"(device budget {MAX_KEY_BITS}); tile the region first")
        return cls(tuple(float(o) for o in origin), float(edge_length),
                   tuple(int(w) for w in widths))

    # -- device ops ----------------------------------------------------------

    def encode(self, points):
        """(N, dim) coordinates -> (N,) int32 voxel keys."""
        origin = jnp.asarray(self.origin, dtype=points.dtype)
        grid = jnp.floor((points - origin) / self.edge_length)
        grid = jnp.clip(grid, 0, jnp.asarray(
            [2**w - 1 for w in self.widths], dtype=points.dtype))
        grid = grid.astype(jnp.int32)
        key = grid[:, 0]
        for axis, shift in enumerate(self.shifts[1:], start=1):
            key = key | (grid[:, axis] << shift)
        return key

    def decode(self, keys):
        """(N,) int32 voxel keys -> (N, dim) float32 voxel centers."""
        columns = []
        for width, shift in zip(self.widths, self.shifts):
            mask = (1 << width) - 1
            columns.append((keys >> shift) & mask)
        grid = jnp.stack(columns, axis=1).astype(jnp.float32)
        origin = jnp.asarray(self.origin, dtype=jnp.float32)
        return grid * self.edge_length + origin + self.edge_length * 0.5
