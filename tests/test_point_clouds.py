"""
FlexCloud tests, mirroring the reference's behavioral contract
(reference: nimrud/utils/tests/point_cloud_tests.py).
"""

import numpy as np
import pytest

from nimrud_tpu.utils.point_clouds import FlexCloud


RNG = np.random.default_rng(10)


def test_instantiation():
    good = RNG.random((1000, 3))
    cloud = FlexCloud(good)
    assert np.array_equal(cloud.corner, good[0])
    assert np.array_equal(cloud.points + cloud.corner, good)
    assert hasattr(cloud, "assets")
    assert cloud.num_points == good.shape[0]
    assert np.array_equal(cloud.id_index, np.arange(good.shape[0]))

    for bad in (RNG.random((1000, 2)), RNG.random((1000, 4)), RNG.random(3)):
        with pytest.raises(ValueError):
            FlexCloud(bad)


def test_add_asset():
    cloud = FlexCloud(RNG.random((1000, 3)))

    asset_1 = RNG.random((100, 2))
    asset_1_idx = RNG.permutation(1000)[:100]
    cloud.add_asset(asset_1, asset_1_idx, "asset_1")

    order = np.argsort(asset_1_idx)
    idx_sorted = asset_1_idx.take(order)
    asset_sorted = asset_1.take(order, axis=0)
    assert np.array_equal(asset_sorted, cloud.assets["asset_1"]["asset"])
    assert np.array_equal(idx_sorted, cloud.assets["asset_1"]["index"])

    # duplicated rows dedupe back to the same stored asset
    cloud.add_asset(
        np.vstack((asset_1, asset_1)),
        np.hstack((asset_1_idx, asset_1_idx)),
        "asset_2")
    assert np.array_equal(asset_sorted, cloud.assets["asset_2"]["asset"])
    assert np.array_equal(idx_sorted, cloud.assets["asset_2"]["index"])

    # shuffled duplicates too
    shuffle = RNG.permutation(200)
    cloud.add_asset(
        np.vstack((asset_1, asset_1)).take(shuffle, axis=0),
        np.hstack((asset_1_idx, asset_1_idx)).take(shuffle),
        "asset_3")
    assert np.array_equal(asset_sorted, cloud.assets["asset_3"]["asset"])
    assert np.array_equal(idx_sorted, cloud.assets["asset_3"]["index"])

    # scalar (1-D) assets work
    shuffled_idx = np.hstack((asset_1_idx, asset_1_idx)).take(shuffle)
    cloud.add_asset(shuffled_idx, shuffled_idx, "asset_4")
    assert np.array_equal(idx_sorted, cloud.assets["asset_4"]["asset"])
    assert np.array_equal(idx_sorted, cloud.assets["asset_4"]["index"])

    # duplicate names are rejected
    with pytest.raises(ValueError):
        cloud.add_asset(asset_1, asset_1_idx, "asset_1")

    # misalignment and out-of-range indices are rejected
    with pytest.raises(ValueError):
        cloud.add_asset(asset_1, asset_1_idx[:50], "bad")
    with pytest.raises(ValueError):
        cloud.add_asset(asset_1, asset_1_idx + 1000, "bad")
    with pytest.raises(ValueError):
        cloud.add_asset(RNG.random((2, 2, 2)), np.arange(2), "bad")


def test_intersection():
    cloud = FlexCloud(RNG.random((1000, 3)))
    asset_1 = RNG.random((100, 2))
    cloud.add_asset(asset_1, np.arange(100), "asset_1")
    asset_2 = RNG.random(100)
    cloud.add_asset(asset_2, np.arange(100) + 50, "asset_2")

    known_idx = np.arange(100)[50:]
    known_block = np.hstack((asset_1[50:], asset_2[:50].reshape(-1, 1)))

    test_idx, test_block = cloud.intersection(["asset_1", "asset_2"])
    assert np.array_equal(known_idx, test_idx)
    assert np.array_equal(known_block, test_block)


def test_intersection_empty():
    # regression: an empty intersection must return empty arrays, not crash
    cloud = FlexCloud(RNG.random((1000, 3)))
    cloud.add_asset(np.ones(10), np.arange(10), "a")
    cloud.add_asset(np.ones((10, 2)), np.arange(10) + 100, "b")
    idx, block = cloud.intersection(["a", "b"])
    assert idx.size == 0
    assert block.shape == (0, 3)


def test_take():
    points = RNG.random((1000, 3))
    cloud = FlexCloud(points)
    idx = RNG.permutation(1000)[:100]
    assert np.array_equal(cloud.take(idx), points.take(idx, axis=0))
    assert np.array_equal(cloud.take(), points)

    shifted = points - points[0]
    assert np.array_equal(
        cloud.take(idx, original_coordinates=False),
        shifted.take(idx, axis=0))
    assert np.array_equal(
        cloud.take(original_coordinates=False), shifted)


def test_asset_management_beyond_reference():
    cloud = RNG.random((50, 3))
    fc = FlexCloud(cloud)
    fc.add_asset(np.arange(10.0), np.arange(10), "a")
    assert "a" in fc
    assert fc.asset_names() == ["a"]
    fc.remove_asset("a")
    assert "a" not in fc and fc.asset_names() == []
    with pytest.raises(ValueError):
        fc.remove_asset("a")
