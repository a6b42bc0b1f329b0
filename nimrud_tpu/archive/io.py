"""
Point-cloud ingest.

Loads .npy / .npz / delimited ASCII (xyz, csv, txt, pts) clouds.  Large
ASCII files stream through a C++ parser when the native extension is
available (nimrud_tpu/native), with a chunked NumPy fallback -- the
capability of the reference's split+genfromtxt loader
(reference: nimrud/prototypes/ml.py:690-726) without the shell games.
"""

import os

import numpy as np

ASCII_SUFFIXES = (".txt", ".csv", ".xyz", ".pts", ".asc")


def _sniff_delimiter(path):
    with open(path, "r") as handle:
        line = handle.readline()
        while line and (line.startswith("#") or not line.strip()):
            line = handle.readline()
    for delim in (",", ";", "\t"):
        if delim in line:
            return delim
    return None     # whitespace


def load_ascii(path, chunk_rows=5_000_000):
    """Delimited ASCII -> float32 array, streamed in chunks."""
    try:
        from nimrud_tpu.native import ascii_loader
        result = ascii_loader.load(path)
        if result is not None:
            return result
    except ImportError:
        pass

    delimiter = _sniff_delimiter(path)
    chunks = []
    with open(path, "r") as handle:
        while True:
            rows = np.loadtxt(
                handle, delimiter=delimiter, dtype=np.float32,
                comments="#", max_rows=chunk_rows, ndmin=2)
            if rows.size == 0:
                break
            chunks.append(rows)
            if rows.shape[0] < chunk_rows:
                break
    if not chunks:
        raise ValueError(f"no data rows in {path}")
    return np.concatenate(chunks, axis=0)


def load_points(source):
    """
    Load a point cloud from an array, .npy/.npz file, or ASCII file.
    Returns a float32 2-D array (rows = points, first 3 columns = XYZ).
    """
    if isinstance(source, np.ndarray):
        cloud = source
    else:
        path = os.fspath(source)
        suffix = os.path.splitext(path)[1].lower()
        if suffix == ".npy":
            cloud = np.load(path)
        elif suffix == ".npz":
            archive = np.load(path)
            cloud = archive[list(archive.keys())[0]]
        elif suffix in ASCII_SUFFIXES:
            cloud = load_ascii(path)
        else:
            raise ValueError(f"unsupported point cloud format: {suffix}")
    cloud = np.asarray(cloud, dtype=np.float32)
    if cloud.ndim != 2 or cloud.shape[1] < 3:
        raise ValueError(
            f"point cloud must be (N, >=3), got {cloud.shape}")
    return cloud


def save_ascii(path, array, delimiter=","):
    np.savetxt(path, array, delimiter=delimiter, fmt="%.6f")
