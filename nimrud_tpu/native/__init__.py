"""
Native host runtime: C++ spatial binning + ASCII ingest via ctypes.

``lib()`` returns the loaded shared library, compiling it on first use
(g++ -O3).  Every consumer has a pure-NumPy fallback, so a missing
compiler degrades performance, never capability.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tilesort.cpp")
_SO = os.path.join(_DIR, "_tilesort.so")

_lock = threading.Lock()
_lib = None
_tried = False

_I64 = ctypes.c_int64
_PF32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_PF64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_PI32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_PI64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def _bind(library):
    library.tile_sort.restype = _I64
    library.tile_sort.argtypes = [
        _PF32, _I64, _PF64, ctypes.c_double, _PI64, _I64,
        _PI32, _PI32, _PI64]
    library.fill_table.restype = None
    library.fill_table.argtypes = [
        _PI32, _PI64, _PI64, _PI64, _I64, _I64, _PI32]
    library.mark_neighbors.restype = None
    library.mark_neighbors.argtypes = [
        _PI64, _I64, _PI64, _PI64, _I64,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
    library.neighbor_rows.restype = None
    library.neighbor_rows.argtypes = [
        _PI64, _I64, _PI64, _PI64, _I64, _PI32, ctypes.c_int32, _PI32]
    library.voxel_unique.restype = _I64
    library.voxel_unique.argtypes = [
        _PF32, _I64, _PF64, ctypes.c_double, _PI64, _PF32]
    library.quantize_u16.restype = None
    library.quantize_u16.argtypes = [
        _PF32, _I64, _PF64, ctypes.c_double,
        np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")]
    library.minmax3.restype = None
    library.minmax3.argtypes = [_PF32, _I64, _PF32, _PF32]
    library.parse_ascii.restype = _I64
    library.parse_ascii.argtypes = [
        ctypes.c_char_p, _I64, _I64, _I64, _PF32]
    return library


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            _lib = _bind(ctypes.CDLL(_SO))
        except Exception:
            _lib = None
    return _lib


# -- high-level wrappers (None when native unavailable) ---------------------

def tile_sort(points, lo, edge, dims, factor):
    """
    Native counting sort by (coarsened) tile id.  Returns
    ``(ids int32, order int32, counts int64)`` or None.
    """
    library = lib()
    if library is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    dims = np.ascontiguousarray(dims, dtype=np.int64)
    qdims = -(-dims // factor)
    grid = int(qdims.prod())
    if grid > np.iinfo(np.int32).max:
        return None
    n = points.shape[0]
    ids = np.empty(n, np.int32)
    order = np.empty(n, np.int32)
    counts = np.empty(grid, np.int64)
    status = library.tile_sort(
        points, n, lo, float(edge), dims, int(factor),
        ids, order, counts)
    if status != 0:
        return None
    return ids, order, counts


def fill_table(order, starts_all, counts_all, wanted, cap):
    """Native fixed-capacity table fill; returns (K+1, cap) int32 or None."""
    library = lib()
    if library is None:
        return None
    order = np.ascontiguousarray(order, dtype=np.int32)
    starts_all = np.ascontiguousarray(starts_all, dtype=np.int64)
    counts_all = np.ascontiguousarray(counts_all, dtype=np.int64)
    wanted = np.ascontiguousarray(wanted, dtype=np.int64)
    table = np.empty((len(wanted) + 1, cap), np.int32)
    library.fill_table(
        order, starts_all, counts_all, wanted, len(wanted), int(cap),
        table)
    return table


def mark_neighbors(tile_ids, dims, qdims, m, n_grid):
    """Native neighbor-of-query mask over the fine grid, or None."""
    library = lib()
    if library is None:
        return None
    tile_ids = np.ascontiguousarray(tile_ids, dtype=np.int64)
    mask = np.zeros(n_grid, np.uint8)
    library.mark_neighbors(
        tile_ids, len(tile_ids),
        np.ascontiguousarray(dims, np.int64),
        np.ascontiguousarray(qdims, np.int64), int(m), mask)
    return mask.view(bool)


def neighbor_rows(tile_ids, dims, qdims, m, grid_row, empty_row):
    """Native per-(tile, offset) candidate-row table, or None."""
    library = lib()
    if library is None:
        return None
    tile_ids = np.ascontiguousarray(tile_ids, dtype=np.int64)
    n_off = (m + 2) ** 3
    out = np.empty((len(tile_ids), n_off), np.int32)
    library.neighbor_rows(
        tile_ids, len(tile_ids),
        np.ascontiguousarray(dims, np.int64),
        np.ascontiguousarray(qdims, np.int64), int(m),
        np.ascontiguousarray(grid_row, np.int32),
        np.int32(empty_row), out)
    return out


def voxel_unique(points, lo, edge, dims):
    """Native voxel dedup -> float32 centers, or None."""
    library = lib()
    if library is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    lo = np.ascontiguousarray(lo, dtype=np.float64)
    dims = np.ascontiguousarray(dims, dtype=np.int64)
    out = np.empty((points.shape[0], 3), np.float32)
    count = library.voxel_unique(
        points, points.shape[0], lo, float(edge), dims, out)
    return out[:count].copy()


def quantize_u16(points, lo, step, pad_to=None):
    """Native uint16 coordinate quantization, or None.

    ``pad_to`` pads the output to that many rows by repeating the last
    point (the padding convention of the device tile grid) without a
    separate float32 pad copy of the input.
    """
    library = lib()
    if library is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = points.shape[0]
    rows = n if pad_to is None else int(pad_to)
    out = np.empty((rows,) + points.shape[1:], np.uint16)
    library.quantize_u16(
        points, n,
        np.ascontiguousarray(lo, np.float64), float(step), out)
    if rows > n and n:
        out[n:] = out[n - 1]
    return out


def minmax3(points):
    """Per-axis (lo, hi) float32 bounds in one native pass, or None."""
    library = lib()
    if library is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float32)
    if points.shape[0] == 0 or points.shape[1] != 3:
        return None
    lo = np.empty(3, np.float32)
    hi = np.empty(3, np.float32)
    library.minmax3(points, points.shape[0], lo, hi)
    return lo, hi


class ascii_loader:
    """Namespace used by nimrud_tpu.archive.io."""

    @staticmethod
    def load(path):
        library = lib()
        if library is None:
            return None
        with open(path, "rb") as handle:
            text = handle.read()
        # count columns from the first data line
        first = None
        for line in text.splitlines():
            stripped = line.strip()
            if stripped and not stripped.startswith(b"#"):
                first = stripped
                break
        if first is None:
            return None
        cols = len(first.replace(b",", b" ").replace(b";", b" ").split())
        max_rows = text.count(b"\n") + 1
        out = np.empty((max_rows, cols), np.float32)
        rows = library.parse_ascii(text, len(text), cols, max_rows, out)
        if rows < 0:
            return None
        return out[:rows].copy()
