"""
Point-cloud ingest.

Loads .npy / .npz / delimited ASCII (xyz, csv, txt, pts) / PLY clouds.
Large ASCII files stream through a C++ parser when the native extension
is available (nimrud_tpu/native), with a chunked NumPy fallback -- the
capability of the reference's split+genfromtxt loader
(reference: nimrud/prototypes/ml.py:690-726) without the shell games.
Dataset-style loaders (cloud file + sidecar label file, the
Semantic3D / Oakland convention the reference's dainty_loader served)
live in :func:`load_labeled`.
"""

import os

import numpy as np

ASCII_SUFFIXES = (".txt", ".csv", ".xyz", ".pts", ".asc")

_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def load_ply(path):
    """
    PLY vertex loader (ascii / binary little- and big-endian): returns a
    float32 (N, n_props) array of the vertex element's scalar properties
    in file order (x, y, z first by convention).  List properties (face
    indices) are skipped -- this is a point-cloud reader.
    """
    with open(path, "rb") as handle:
        if handle.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        n_vertices = None
        props = []
        in_vertex = False
        while True:
            line = handle.readline()
            if not line:
                raise ValueError(f"{path}: unterminated PLY header")
            words = line.decode("ascii", "replace").split()
            if not words:
                continue
            if words[0] == "format":
                fmt = words[1]
            elif words[0] == "element":
                in_vertex = words[1] == "vertex"
                if in_vertex:
                    n_vertices = int(words[2])
            elif words[0] == "property" and in_vertex:
                if words[1] == "list":
                    raise ValueError(
                        f"{path}: list property on vertex element")
                props.append((words[2], _PLY_DTYPES[words[1]]))
            elif words[0] == "end_header":
                break
        if n_vertices is None:
            raise ValueError(f"{path}: no vertex element")

        if fmt == "ascii":
            rows = np.loadtxt(
                handle, dtype=np.float32, max_rows=n_vertices, ndmin=2)
            return rows[:, : len(props)].astype(np.float32)
        endian = "<" if fmt == "binary_little_endian" else ">"
        dtype = np.dtype([(name, endian + kind) for name, kind in props])
        raw = np.frombuffer(
            handle.read(dtype.itemsize * n_vertices), dtype=dtype,
            count=n_vertices)
        out = np.empty((n_vertices, len(props)), np.float32)
        for i, (name, _) in enumerate(props):
            out[:, i] = raw[name].astype(np.float32)
        return out


def save_ply(path, points, binary=True):
    """Write an (N, 3+) float32 cloud as a PLY vertex element (columns
    beyond xyz stored as prop_3, prop_4, ...)."""
    points = np.asarray(points, dtype=np.float32)
    names = ["x", "y", "z"] + [
        f"prop_{i}" for i in range(3, points.shape[1])]
    header = ["ply",
              "format binary_little_endian 1.0" if binary
              else "format ascii 1.0",
              f"element vertex {len(points)}"]
    header += [f"property float {name}" for name in names[:points.shape[1]]]
    header.append("end_header")
    with open(path, "wb") as handle:
        handle.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            handle.write(
                np.ascontiguousarray(points, "<f4").tobytes())
        else:
            np.savetxt(handle, points, fmt="%.6f")


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
        elif suffix == ".ply":
            cloud = load_ply(path)
        elif suffix in ASCII_SUFFIXES:
            cloud = load_ascii(path)
        else:
            raise ValueError(f"unsupported point cloud format: {suffix}")
    cloud = np.asarray(cloud, dtype=np.float32)
    if cloud.ndim != 2 or cloud.shape[1] < 3:
        raise ValueError(
            f"point cloud must be (N, >=3), got {cloud.shape}")
    return cloud


def load_labeled(cloud_path, labels_path=None, *, null_label=None):
    """
    Dataset-convention loader: a cloud file plus a sidecar per-point
    label file (the Semantic3D ``.labels`` / Oakland convention; the
    reference's dainty_loader handled the cloud half only).

    ``labels_path`` defaults to the cloud path with a ``.labels``
    suffix.  ``null_label``, if given, is remapped to the archive's
    NULL_LABEL (999) -- Semantic3D uses 0 for "unlabeled".

    Returns ``(cloud float32 (N, C), labels int32 (N,))``.
    """
    cloud = load_points(cloud_path)
    if labels_path is None:
        base = os.path.splitext(os.fspath(cloud_path))[0]
        labels_path = base + ".labels"
    labels = np.loadtxt(labels_path, dtype=np.int64, ndmin=1)
    if labels.ndim > 1:
        labels = labels[:, 0]
    if labels.shape[0] != cloud.shape[0]:
        raise ValueError(
            f"label count {labels.shape[0]} != point count "
            f"{cloud.shape[0]}")
    if null_label is not None:
        from nimrud_tpu.archive.store import NULL_LABEL
        labels = np.where(labels == null_label, NULL_LABEL, labels)
    return cloud, labels.astype(np.int32)


def save_ascii(path, array, delimiter=","):
    np.savetxt(path, array, delimiter=delimiter, fmt="%.6f")
