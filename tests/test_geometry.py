"""
Voxel filter and nested partitioning tests.

The unit cases (hand-computed shift/width/mask/address constants, bounds
checks, dedup semantics, buffered-region containment) mirror the reference
suite (reference: nimrud/utils/tests/geometry_tests.py) so the behavioral
contract is pinned exactly.  The octree/grid partition tests are new -- the
reference left them as failing stubs.
"""

from itertools import product

import numpy as np
import pytest

from nimrud_tpu.utils import geometry


RNG = np.random.default_rng(10)


# ---------------------------------------------------------------------------
# VoxelFilter
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim", [2, 3])
def test_voxel_init(dim):
    num, scale, edge_length = 1000, 100, 0.5

    # a single point cannot define a grid
    with pytest.raises(ValueError):
        geometry.VoxelFilter(RNG.random((1, dim)) * scale, edge_length)

    points = RNG.random((num, dim)) * scale
    vf = geometry.VoxelFilter(points, edge_length)
    # address 0's voxel is centered on the cloud's true minimum corner
    assert np.array_equal(vf.minimum_corner, points.min(0) - edge_length / 2)
    assert np.array_equal(vf.maximum_corner, points.max(0) + edge_length / 2)
    assert vf.edge_length == edge_length


@pytest.mark.parametrize("dim", [1, 4])
def test_voxel_init_bad_dim(dim):
    with pytest.raises(ValueError):
        geometry.VoxelFilter(RNG.random((1000, dim)), 0.5)


def test_voxel_init_bad_shape():
    with pytest.raises(ValueError):
        geometry.VoxelFilter(RNG.random(10), 0.5)
    with pytest.raises(ValueError):
        geometry.VoxelFilter(RNG.random((10, 10, 10)), 0.5)


@pytest.mark.parametrize("dim", [2, 3])
def test_voxel_shift(dim):
    points = np.asarray([[0, 0, 0], [100, 100, 100]])[:, :dim]

    # 100 m span plus half-edge padding at 1 mm edge -> 17 bits per axis
    vf = geometry.VoxelFilter(points, 0.001)
    assert np.array_equal(vf.shifts, [17, 34][:dim - 1])
    assert np.array_equal(vf.widths, [17] * dim)

    # edges small enough to overflow the 64-bit address budget must raise
    bad_edge = 0.00001 if dim == 3 else 0.00000001
    span = (points.max(0) + bad_edge / 2) - (points.min(0) - bad_edge / 2)
    assert np.ceil(np.log2(span / bad_edge)).sum() > 64
    with pytest.raises(ValueError):
        geometry.VoxelFilter(points, bad_edge)


@pytest.mark.parametrize("dim", [2, 3])
def test_masks(dim):
    points = np.asarray([[0, 0, 0], [100, 100, 100]])[:, :dim]
    vf = geometry.VoxelFilter(points, 1)
    expected = [
        0b1111111,
        0b11111110000000,
        0b111111100000000000000][:dim]
    assert np.array_equal(expected, vf.masks)


@pytest.mark.parametrize("dim", [2, 3])
def test_in_bounds(dim):
    points = np.asarray([[0, 0, 0], [100, 100, 100]])[:, :dim]
    vf = geometry.VoxelFilter(points, 1)

    def ok(p):
        try:
            vf._check_in_bounds(p)
        except ValueError:
            return False
        return True

    assert ok(np.zeros((1, dim)) - 0.5)
    assert not ok(np.zeros((1, dim)) - 1.5)
    assert ok(np.zeros((1, dim)) + 0.5)
    assert ok(np.zeros((1, dim)) + 100.5)
    assert not ok(np.zeros((1, dim)) + 101.5)
    assert not ok(np.zeros((1, dim + 1)))
    assert ok(np.zeros(dim))
    assert not ok(np.zeros(dim + 1))


def test_voxel_address():
    # hand-computed constant from the reference suite: grid point (10,11,12)
    # with 7-bit fields packs to 198026, and because the fields are disjoint
    # XOR == addition
    vf = geometry.VoxelFilter(np.asarray([[0, 0, 0], [100, 100, 100]]), 1)
    test_point = np.arange(3) + 10
    grid = np.floor((test_point - vf.minimum_corner) / 1).astype(np.int64)
    assert np.array_equal(grid, [10, 11, 12])
    assert np.array_equal(vf.shifts, [7, 14])
    known = 198026
    assert known == 10 + (11 << 7) + (12 << 14)
    assert known == 10 ^ (11 << 7) ^ (12 << 14)
    assert vf.coordinate_to_address(test_point) == known


def test_voxel_transform():
    boundary = np.asarray([[0, 0, 0], [100, 100, 100]])
    vf = geometry.VoxelFilter(boundary, 1)
    known_address = 198026
    known_coords = np.arange(3) + 10
    assert np.allclose(
        known_coords, vf.address_to_coordinate(known_address).flatten())

    vf2 = geometry.VoxelFilter(boundary[:, :2], 1)
    roundtrip = vf2.address_to_coordinate(
        vf2.coordinate_to_address(known_coords[:2]).flatten())
    assert np.allclose(known_coords[:2], roundtrip)


@pytest.mark.parametrize("dim", [2, 3])
def test_voxel_unique(dim):
    boundary = np.asarray([[0, 0, 0], [100, 100, 100]])[:, :dim]
    vf = geometry.VoxelFilter(boundary, 1)
    # ten distinct voxel centers, each duplicated once
    centers = np.concatenate(
        [np.zeros((1, dim)) + off for off in np.arange(0, 20, 2)])
    doubled = np.vstack((centers, centers))
    assert np.array_equal(centers, vf.unique_voxels(doubled))


def test_find_neighbors():
    vf = geometry.VoxelFilter(np.asarray([[0, 0, 0], [10, 10, 10]]), 1.0)
    # an interior voxel has the full neighbor complement
    center = vf.coordinate_to_address(np.asarray([[5.0, 5.0, 5.0]]))
    assert geometry.np.unique(vf.find_neighbors(center)).size == 26
    assert geometry.np.unique(vf.find_facing_neighbors(center)).size == 6
    # neighbor coordinates are one edge away in Chebyshev distance
    coords = vf.address_to_coordinate(vf.find_facing_neighbors(center))
    middle = vf.address_to_coordinate(center)
    dists = np.abs(coords - middle).max(1)
    assert np.allclose(dists, 1.0)
    # a corner voxel has fewer in-bounds neighbors
    corner = vf.coordinate_to_address(np.asarray([[-0.4, -0.4, -0.4]]))
    assert vf.find_neighbors(corner).size == 7
    assert vf.find_facing_neighbors(corner).size == 3


# ---------------------------------------------------------------------------
# nested partitioning
# ---------------------------------------------------------------------------

def test_nested_regions():
    query_set = RNG.random((5000, 3))
    search_space = RNG.random((20000, 3)) * 3 - 1
    low = np.array([0.25, 0.25, 0.25])
    high = np.array([0.75, 0.75, 0.75])
    buffer_radius = 0.5

    q_idx, s_idx = geometry.nested_regions(
        query_set, search_space, buffer_radius, low, high)
    q = query_set.take(q_idx, axis=0)
    s = search_space.take(s_idx, axis=0)
    assert np.all(q.min(0) >= low) and np.all(q.max(0) <= high)
    assert np.all(s.min(0) >= low - buffer_radius)
    assert np.all(s.max(0) <= high + buffer_radius)

    # the culls keep every qualifying point, not just some
    q_mask = np.all((query_set >= low) & (query_set <= high), axis=1)
    assert q_idx.size == q_mask.sum()
    s_mask = np.all((search_space >= low - buffer_radius)
                    & (search_space <= high + buffer_radius), axis=1)
    assert s_idx.size == s_mask.sum()

    # an empty region returns empty index sets
    q_idx, s_idx = geometry.nested_regions(
        query_set, search_space, buffer_radius,
        np.ones(3) * 100, np.ones(3) * 110)
    assert q_idx.size == 0 and s_idx.size == 0


def test_octree_init():
    num_points, scale, buffer_radius = 1000, 10, 0.5
    search_space = RNG.random((num_points, 3)) * scale
    query_set = RNG.random((num_points, 3)) * scale

    tree = geometry.NestedOctree(query_set, search_space, buffer_radius)
    assert tree.buffer_radius == buffer_radius
    assert np.array_equal(tree.search_space, search_space)
    assert np.array_equal(tree.query_set, query_set)
    assert tree.cubes == []
    assert np.array_equal(tree.maximum_corner, query_set.max(0))
    assert np.array_equal(tree.minimum_corner, query_set.min(0))

    bad_shapes = [query_set.flatten(), query_set.reshape(-1, 2),
                  query_set.reshape(-1, 6), query_set[0:1]]
    for bad in bad_shapes:
        with pytest.raises(ValueError):
            geometry.NestedOctree(bad, search_space, buffer_radius)
        with pytest.raises(ValueError):
            geometry.NestedOctree(query_set, bad, buffer_radius)

    with pytest.raises(ValueError):
        geometry.NestedOctree(query_set, search_space, -buffer_radius)

    for algorithm in ["naive", "take_one", "take_three"]:
        assert algorithm in tree.cube_generators


def test_octree_partition_accept():
    # if the buffered search population already fits, one partition results
    query_set = RNG.random((1000, 3))
    search_low = RNG.random((999, 3))
    # more total points, but the extras are far outside the query region
    search_high = np.vstack((search_low, RNG.random((1000, 3)) + 100))

    for search_space in (search_low, search_high):
        tree = geometry.NestedOctree(query_set, search_space, 0.01)
        tree.partition(1000)
        assert len(tree.cubes) == 1


@pytest.mark.parametrize("algorithm", ["naive", "take_one", "take_three"])
def test_octree_cube_generator(algorithm):
    cube_edge, buffer_radius = 0.5, 0.1

    for offset in [np.zeros(3), RNG.random(3)]:
        query_set = RNG.random((1000, 3)) * 2 * cube_edge
        search_space = RNG.random((4000, 3)) * 4 * cube_edge - 0.5
        # pin the query bounds so we know them a priori
        query_set[0] *= 0
        query_set[1] = 2 * cube_edge
        query_set += offset
        search_space += offset
        minimum_corner = query_set.min(0)

        tree = geometry.NestedOctree(query_set, search_space, buffer_radius)
        known_lows = (np.asarray(list(product([0, 1], repeat=3))) * cube_edge
                      + minimum_corner)
        known_highs = known_lows + cube_edge

        cubes = list(tree.cube_generator(cube_edge, algorithm=algorithm))
        assert len(cubes) == 8
        for num, (q_cube, s_cube) in enumerate(cubes):
            low, high = known_lows[num], known_highs[num]
            assert np.all(q_cube.min(0) >= low)
            assert np.all(q_cube.max(0) <= high)
            assert np.all(s_cube.min(0) >= low - buffer_radius)
            assert np.all(s_cube.max(0) <= high + buffer_radius)
            # containment must also be complete, not just sound
            want = np.all((query_set >= low) & (query_set <= high), axis=1)
            assert q_cube.shape[0] == want.sum()

    with pytest.raises(NameError):
        list(tree.cube_generator(cube_edge, algorithm="bogus"))


def _check_partitions(tree, query_set, search_space, buffer_radius,
                      max_population):
    """Common invariants for any complete nested partitioning."""
    parts = list(tree.partition_generator())
    assert parts, "no partitions produced"

    seen = np.zeros(query_set.shape[0], dtype=int)
    for q_idx, s_idx in parts:
        assert s_idx.size <= max_population
        seen[q_idx] += 1
        if q_idx.size == 0:
            continue
        # the search partition must contain every search point within
        # buffer_radius (in Chebyshev distance) of the query cube's bounds
        low = query_set[q_idx].min(0) - buffer_radius
        high = query_set[q_idx].max(0) + buffer_radius
        required = np.all(
            (search_space >= low) & (search_space <= high), axis=1)
        got = np.zeros(search_space.shape[0], dtype=bool)
        got[s_idx] = True
        missing = required & ~got
        assert not missing.any(), \
            f"{missing.sum()} halo points missing from a partition"

    # every query point processed at least once; duplicates only possible on
    # shared cube faces
    assert np.all(seen >= 1), "some query points were never partitioned"


def test_octree_partition_octree():
    # dense cloud forcing real recursion (reference stub, implemented here)
    query_set = RNG.random((4000, 3)) * 8
    search_space = RNG.random((8000, 3)) * 8
    buffer_radius = 0.25
    max_population = 1500

    tree = geometry.NestedOctree(query_set, search_space, buffer_radius)
    tree.partition(max_population)
    assert len(list(tree.partition_generator())) > 1
    _check_partitions(
        tree, query_set, search_space, buffer_radius, max_population)


def test_octree_partition_grid():
    # small region relative to buffer -> octree hands off to NestedGrid
    query_set = RNG.random((3000, 3))
    search_space = RNG.random((6000, 3))
    buffer_radius = 0.2
    max_population = 2500

    tree = geometry.NestedOctree(query_set, search_space, buffer_radius)
    tree.partition(max_population)
    _check_partitions(
        tree, query_set, search_space, buffer_radius, max_population)


def test_octree_partition_deep_covers_extreme_points():
    # regression: rounded low+edge cube bounds landed one ulp below the
    # true region corner and silently orphaned the extreme points
    rng = np.random.default_rng(1)
    cloud = rng.random((5000, 3)) * 100
    tree = geometry.NestedOctree(cloud, cloud, buffer_radius=3.0)
    tree.partition(max_population=300)
    covered = np.zeros(len(cloud), dtype=bool)
    for q_idx, _ in tree.partition_generator():
        covered[q_idx] = True
    assert covered.all(), f"{(~covered).sum()} query points orphaned"


def test_procedural_partitioner():
    # the glomming partitioner the reference only sketched: every query
    # point lands in exactly one partition, every partition's search set
    # contains all points within the buffer of its query points, and
    # populations respect the budget except flagged single-cell overflows
    rng = np.random.default_rng(3)
    query_set = rng.random((2000, 3)) * 6
    search_space = rng.random((5000, 3)) * 6
    buffer_radius = 0.5
    max_population = 800

    part = geometry.ProceduralNestedPartitioner(
        query_set, search_space, buffer_radius, max_population, seed=0)
    seen = np.zeros(len(query_set), dtype=int)
    partitions = list(part.partition_generator())
    assert len(partitions) > 1
    from scipy.spatial import cKDTree
    for q_idx, s_idx in partitions:
        seen[q_idx] += 1
        if q_idx.size == 0:
            continue
        # partitions are concave cell unions: the contract is per query
        # POINT -- every search point within the buffer (Chebyshev) of
        # any query point must be present
        tree = cKDTree(query_set[q_idx])
        dist, _ = tree.query(search_space, p=np.inf)
        required = dist <= buffer_radius
        got = np.zeros(len(search_space), dtype=bool)
        got[s_idx] = True
        assert not (required & ~got).any(), "halo points missing"
    assert np.all(seen == 1), "query points must appear exactly once"

    # budget respected whenever a partition spans more than one cell
    for q_idx, s_idx in partitions:
        span = query_set[q_idx].max(0) - query_set[q_idx].min(0)
        if (span > buffer_radius).any():
            assert s_idx.size <= max_population


def test_nested_grid_standalone():
    query_set = RNG.random((3000, 3)) * 4
    search_space = RNG.random((9000, 3)) * 4
    buffer_radius = 0.1
    max_population = 2000

    grid = geometry.NestedGrid(
        query_set, search_space, buffer_radius, max_population)
    _check_partitions(
        grid, query_set, search_space, buffer_radius, max_population)
