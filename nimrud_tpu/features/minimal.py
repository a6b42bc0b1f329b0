"""
The minimal pipeline: the framework's behavioral parity contract.

API-compatible with the reference's clean CPU implementation
(reference: nimrud/minimal/multiscale.py:27-123): per scale, voxel-
downsample the search cloud, find every search voxel within the radius of
each query point, and emit ``[population, centroid_displacement, eig1,
eig2]`` -- the two largest eigenvalues of the neighborhood covariance
normalized to sum 1.  Undefined features (empty or single-point
neighborhoods) are zeros.

The implementation is the TPU pipeline (masked moment matmuls + closed
form eigensolve) rather than a kd-tree walk; golden-parity tests check the
numbers against a float64 scipy/NumPy oracle.
"""

import time


from nimrud_tpu.features.multiscale import extract_scaleset


def one_scale_single_core(query_cloud, search_cloud, edge_length, radius,
                          verbose=False, chunk_size=1024):
    """Features for one (voxel edge, radius) analysis scale: (N, 4)."""
    return extract_scaleset(
        query_cloud, search_cloud, [(edge_length, (radius,))],
        kind="minimal", chunk_size=chunk_size)


def process_single_core(query_cloud, search_cloud, edge_lengths, radii,
                        verbose=False, chunk_size=1024):
    """
    Multiscale features aligned with the query cloud: (N, 4 * n_scales),
    scales in caller order.
    """
    assert len(edge_lengths) == len(radii), \
        "edge_lengths and radii should be equal-length sequences."

    start = time.perf_counter()
    scaleset = [(edge, (radius,))
                for edge, radius in zip(edge_lengths, radii)]
    features = extract_scaleset(
        query_cloud, search_cloud, scaleset,
        kind="minimal", chunk_size=chunk_size)
    if verbose:
        elapsed = time.perf_counter() - start
        rate = query_cloud.shape[0] * len(radii) / max(elapsed, 1e-9)
        print(f"{len(radii)} scales over {query_cloud.shape[0]} points "
              f"in {elapsed:.3f}s ({rate:,.0f} point-scales/s)")
    return features


# the reference's tuning constants, kept for API familiarity; the TPU
# pipeline's chunking is independent of them
LEAFSIZE = 300
QUERY_CHUNK_SIZE = 1000
