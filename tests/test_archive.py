"""
CloudArchive tests: create/open round-trip, natural voxel ingest,
asset semantics, intersection, null-label handling, ASCII ingest.
"""

import os

import numpy as np
import pytest

from nimrud_tpu.archive import io as cloud_io
from nimrud_tpu.archive.store import (
    NULL_LABEL, CloudArchive, natural_voxel_indices)


RNG = np.random.default_rng(10)


def test_create_open_roundtrip(tmp_path):
    cloud = RNG.random((500, 3)).astype(np.float32) * 10
    archive = CloudArchive.create(tmp_path / "arc", cloud, name="test")
    reopened = CloudArchive.open(tmp_path / "arc")
    assert reopened.manifest["name"] == "test"
    assert np.allclose(reopened.take(), cloud, atol=1e-5)
    with pytest.raises(FileExistsError):
        CloudArchive.create(tmp_path / "arc", cloud)
    CloudArchive.create(tmp_path / "arc", cloud, overwrite=True)


def test_extra_columns_become_attributes(tmp_path):
    cloud = np.hstack([RNG.random((100, 3)), RNG.random((100, 2))])
    archive = CloudArchive.create(tmp_path / "arc", cloud)
    data, index, _ = archive.get_asset("source_attributes")
    assert data.shape == (100, 2)
    assert np.allclose(data, cloud[:, 3:], atol=1e-6)


def test_recentering(tmp_path):
    # a UTM-style far-from-origin cloud is recentered; take() restores it
    cloud = RNG.random((100, 3)) + [500_000, 4_000_000, 100]
    archive = CloudArchive.create(tmp_path / "arc", cloud)
    assert np.linalg.norm(archive.points.mean(0)) < 10
    assert np.allclose(archive.take(), cloud, atol=1e-3)


def test_natural_voxel_ingest(tmp_path):
    base = RNG.random((50, 3)) * 10
    cloud = np.vstack([base, base + 1e-4])      # duplicates within voxels
    keep = natural_voxel_indices(cloud, 0.5)
    assert len(keep) < len(cloud)
    archive = CloudArchive.create(tmp_path / "arc", cloud, voxel=0.5)
    assert archive.manifest["num_points"] == len(keep)
    # natural filter keeps REAL points, not voxel centers
    stored = archive.take()
    distances = np.abs(stored[:, None, :] - cloud[None]).sum(-1).min(1)
    assert distances.max() < 1e-5


def test_assets_and_intersection(tmp_path):
    archive = CloudArchive.create(
        tmp_path / "arc", RNG.random((200, 3)))
    feats = RNG.random((100, 4)).astype(np.float32)
    archive.add_asset("feats", feats, np.arange(100), meta={"scales": [1]})
    labels = RNG.integers(0, 3, 150).astype(np.int32)
    archive.add_asset("labels", labels, np.arange(150) + 50)

    index, block = archive.intersection(["feats", "labels"])
    assert np.array_equal(index, np.arange(50) + 50)
    assert block.shape == (50, 5)
    assert np.allclose(block[:, :4], feats[50:])

    data, idx, meta = archive.get_asset("feats")
    assert meta == {"scales": [1]}
    with pytest.raises(ValueError):
        archive.add_asset("feats", feats, np.arange(100))
    archive.add_asset("feats", feats * 2, np.arange(100), overwrite=True)

    archive.remove_asset("feats")
    assert "feats" not in archive.list_assets()
    # persisted across reopen
    reopened = CloudArchive.open(tmp_path / "arc")
    assert "labels" in reopened.list_assets()
    assert "feats" not in reopened.list_assets()


def test_null_labels(tmp_path):
    archive = CloudArchive.create(
        tmp_path / "arc", RNG.random((100, 3)))
    labels = np.full(100, NULL_LABEL, np.int32)
    labels[:30] = RNG.integers(0, 3, 30)
    archive.add_asset("labels", labels, np.arange(100))
    assert np.array_equal(archive.labeled_indices(), np.arange(30))


def test_ascii_ingest(tmp_path):
    cloud = RNG.random((50, 4)) * 10
    path = tmp_path / "cloud.csv"
    np.savetxt(path, cloud, delimiter=",", fmt="%.6f")
    loaded = cloud_io.load_points(path)
    assert loaded.shape == (50, 4)
    assert np.allclose(loaded, cloud, atol=1e-5)

    # whitespace-delimited too
    path2 = tmp_path / "cloud.xyz"
    np.savetxt(path2, cloud[:, :3], fmt="%.6f")
    loaded2 = cloud_io.load_points(path2)
    assert loaded2.shape == (50, 3)

    with pytest.raises(ValueError):
        cloud_io.load_points(str(tmp_path / "cloud.laz"))


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    cloud = rng.random((500, 5)).astype(np.float32) * 10
    binary = tmp_path / "b.ply"
    ascii_ = tmp_path / "a.ply"
    cloud_io.save_ply(binary, cloud, binary=True)
    cloud_io.save_ply(ascii_, cloud, binary=False)
    assert np.array_equal(cloud_io.load_ply(binary), cloud)
    assert np.allclose(cloud_io.load_ply(ascii_), cloud, atol=1e-5)
    # the generic entry point routes .ply
    assert np.array_equal(cloud_io.load_points(binary), cloud)


def test_ply_big_endian_and_mixed_types(tmp_path):
    # hand-built big-endian PLY with mixed property types
    path = tmp_path / "be.ply"
    xyz = np.array([[1.5, 2.5, 3.5], [4.0, 5.0, 6.0]], ">f4")
    intensity = np.array([7, 260], ">u2")
    header = (b"ply\nformat binary_big_endian 1.0\n"
              b"element vertex 2\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property ushort intensity\nend_header\n")
    rec = np.zeros(2, dtype=[("x", ">f4"), ("y", ">f4"), ("z", ">f4"),
                             ("i", ">u2")])
    rec["x"], rec["y"], rec["z"] = xyz.T
    rec["i"] = intensity
    path.write_bytes(header + rec.tobytes())
    got = cloud_io.load_ply(path)
    assert got.shape == (2, 4)
    assert np.allclose(got[:, :3], xyz.astype(np.float64))
    assert np.array_equal(got[:, 3], [7, 260])


def test_load_labeled_semantic3d_convention(tmp_path):
    rng = np.random.default_rng(5)
    cloud = rng.random((200, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 200)
    np.savetxt(tmp_path / "scan.txt", cloud, fmt="%.6f")
    np.savetxt(tmp_path / "scan.labels", labels, fmt="%d")
    got_cloud, got_labels = cloud_io.load_labeled(
        tmp_path / "scan.txt", null_label=0)
    assert np.allclose(got_cloud, cloud, atol=1e-5)
    assert got_labels.dtype == np.int32
    assert np.array_equal(got_labels[labels != 0], labels[labels != 0])
    assert (got_labels[labels == 0] == NULL_LABEL).all()
    with pytest.raises(ValueError):
        np.savetxt(tmp_path / "short.labels", labels[:100], fmt="%d")
        cloud_io.load_labeled(tmp_path / "scan.txt",
                              tmp_path / "short.labels")


def test_las_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    cloud = np.column_stack([
        rng.random((300, 3)) * 50 + [1000.0, 2000.0, 30.0],
        rng.integers(0, 65536, 300),                 # intensity
    ]).astype(np.float64)
    classes = rng.integers(0, 8, 300).astype(np.int32)
    path = tmp_path / "scan.las"
    cloud_io.save_las(path, cloud, classification=classes)
    got, got_cls = cloud_io.load_las(path, with_classification=True)
    assert got.shape == (300, 4)
    assert np.allclose(got[:, :3], cloud[:, :3], atol=1e-3)  # mm scale
    assert np.array_equal(got[:, 3], cloud[:, 3])
    assert np.array_equal(got_cls, classes)
    # generic entry point routes .las
    assert np.allclose(cloud_io.load_points(path), got)
    # .las with no sidecar: labels come from the LAS classification
    got_cloud, labels = cloud_io.load_labeled(path, null_label=0)
    assert labels.dtype == np.int32
    want = np.where(classes == 0, NULL_LABEL, classes)
    assert np.array_equal(labels, want)


def test_las_rgb_format(tmp_path):
    rng = np.random.default_rng(7)
    cloud = np.column_stack([
        rng.random((100, 3)) * 10,
        rng.integers(0, 65536, (100, 4)),            # intensity + rgb
    ]).astype(np.float64)
    path = tmp_path / "rgb.las"
    cloud_io.save_las(path, cloud, scale=1e-4)
    got = cloud_io.load_las(path)
    assert got.shape == (100, 7)
    assert np.allclose(got[:, :3], cloud[:, :3], atol=1e-4)
    assert np.array_equal(got[:, 3:], cloud[:, 3:])


def test_las_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.las"
    bad.write_bytes(b"NOPE" + b"\0" * 400)
    with pytest.raises(ValueError, match="not a LAS"):
        cloud_io.load_las(bad)
    # LAZ compression bit set
    laz = bytearray(b"LASF" + b"\0" * 371)
    laz[104] = 0x80 | 1
    lazf = tmp_path / "c.las"
    lazf.write_bytes(bytes(laz))
    with pytest.raises(ValueError, match="LAZ"):
        cloud_io.load_las(lazf)
