"""
Property-based equivalence: random scene/config draws, not fixed
scenarios (ROADMAP round-1 quality item 11).  For every draw the three
extraction paths (dense masked matmuls, host-planned tiled grid,
device-built fused grid) must agree: populations pin the neighbor sets,
values compared where populations match.
"""

import numpy as np
import pytest

from nimrud_tpu.features.multiscale import extract_scaleset


def _random_config(rng):
    n_search = int(rng.integers(1500, 6000))
    n_query = int(rng.integers(200, 800))
    aspect = rng.choice([
        [10, 10, 10], [30, 30, 2], [40, 4, 4], [15, 15, 0.5]])
    edge = float(rng.choice([0.2, 0.35, 0.5]))
    n_radii = int(rng.integers(1, 3))
    top = float(rng.choice([0.8, 1.2, 1.6]))
    radii = tuple(round(top / (2 ** i), 3) for i in range(n_radii))
    kind = str(rng.choice(["minimal", "geometric", "covariance"]))
    m = int(rng.choice([2, 3]))
    q_cap = int(rng.choice([16, 64]))
    return n_search, n_query, aspect, edge, radii, kind, m, q_cap


# two draws stay in the default selection (one small, one that hits
# the q_cap=64 config); the rest are release-grade `-m slow` coverage
@pytest.mark.parametrize(
    "case", [0, 4] + [pytest.param(c, marks=pytest.mark.slow)
                      for c in (1, 2, 3, 5)])
def test_dense_tiled_fused_agree_on_random_configs(case):
    rng = np.random.default_rng(1000 + case)
    n_search, n_query, aspect, edge, radii, kind, m, q_cap = \
        _random_config(rng)
    # clustered + uniform mix, clipped to the aspect box
    uniform = rng.random((n_search // 2, 3)) * aspect
    blob_centers = rng.random((5, 3)) * aspect
    blobs = (blob_centers[rng.integers(0, 5, n_search - len(uniform))]
             + rng.normal(0, min(aspect) / 8 + 0.05,
                          (n_search - len(uniform), 3)))
    search = np.clip(np.vstack([uniform, blobs]), 0,
                     aspect).astype(np.float32)
    query = search[rng.permutation(n_search)[:n_query]]

    scaleset = [(edge, radii)]
    tuning = {"query_tile_factor": m, "query_capacity": q_cap}
    dense = extract_scaleset(
        query, search, scaleset, kind=kind, method="dense")
    tiled = extract_scaleset(
        query, search, scaleset, kind=kind, method="tiled",
        tuning=tuning)
    fused = extract_scaleset(
        query, search, scaleset, kind=kind, method="fused",
        tuning=tuning)

    width = dense.shape[1] // len(radii)
    # raw random clouds: a few points sit on radius shells, so f32
    # paths with different recentering may flip them
    for other, label, pop_tol in ((tiled, "tiled", 0.01),
                                  (fused, "fused", 0.02)):
        assert other.shape == dense.shape
        for ri in range(len(radii)):
            pop_d = dense[:, width * ri]
            pop_o = other[:, width * ri]
            agree = np.isclose(pop_d, pop_o, rtol=1e-6)
            assert agree.mean() >= 1.0 - pop_tol - 1e-9, (
                case, label, ri, agree.mean())
            cols = slice(width * ri, width * (ri + 1))
            close = np.isclose(
                other[agree, cols], dense[agree, cols],
                rtol=2e-3, atol=5e-3)
            assert close.mean() > 0.999, (case, label, ri, close.mean())
