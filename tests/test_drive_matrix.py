"""
Systematic fit-vs-serve agreement across the serving config lattice.

The round-4 voxel-anchor skew (fit scored 0.90 on its own features,
served 0.16 -- ANTI-predictive -- with every overflow counter zero) was
invisible to the whole suite because no test asserted that what fit()
trains on is what predict() serves across configuration EDGES.  This
matrix drives every combination of

  {fixed bounds with non-multiple padding}
    x {self-search, designated stage_search}
    x {uint16, float32 uploads}
    x {minimal, vector, sazo}

end-to-end and asserts fit-feature argmax == served labels.  Exact
equality is required everywhere except uint16 SELF-search, where
serving deliberately quantizes the upload (fit's extract_device reads
raw f32, so points whose neighbor distance sits within half a
quantization step of a radius shell may flip a population); there the
contract is near-total agreement and is asserted at >= 0.995.

Two representative cells run in the default selection (including the
round-4 uint16-designated bug cell); the full lattice runs under
``-m slow``.
"""

import numpy as np
import pytest

from nimrud_tpu.pipeline import GeometryClassifier

RNG = np.random.default_rng(21)
SCALESET = [(0.2, (0.8, 0.4))]


def _scene(per=400):
    sheet = RNG.random((per, 3)) * [8, 8, 0.02]
    line = RNG.random((per, 3)) * [0.02, 0.02, 8] + [10, 4, 0]
    blob = RNG.normal([16, 4, 4], 1.0, (per, 3))
    cloud = np.vstack([sheet, line, blob]).astype(np.float32)
    labels = np.repeat([0, 1, 2], per).astype(np.int32)
    return cloud, labels


def _drive_cell(kind, search_mode, transfer_dtype):
    import jax.numpy as jnp

    cloud, labels = _scene()
    # the designated map is a DISTINCT jittered cloud (the production
    # shape: one search asset, queries stream against it); self-search
    # serves the cloud against itself
    if search_mode == "designated":
        search = (cloud + RNG.normal(0, 0.02, cloud.shape)
                  ).astype(np.float32)
    else:
        search = cloud
    attrs = None
    if kind == "vector":
        # class-correlated attribute columns on the SEARCH side (vector
        # features are attribute means interpolated onto search voxels)
        attrs = np.stack(
            [labels + 0.05 * RNG.standard_normal(len(labels)),
             RNG.random(len(labels))], axis=1).astype(np.float32)

    # bounds padding deliberately NOT a multiple of the 0.2 voxel edge
    # (the round-4 anchor-skew regime)
    lo = np.minimum(cloud.min(0), search.min(0)) - 0.37
    hi = np.maximum(cloud.max(0), search.max(0)) + 0.53
    model = GeometryClassifier(
        SCALESET, kind=kind, classifier="linear",
        classifier_kwargs={"epochs": 10, "seed": 0},
        transfer_dtype=transfer_dtype, backend="packed",
        bounds=(lo, hi), trim_entries=True)
    model.fit(cloud, labels,
              search=None if search is cloud else search,
              attributes=attrs)

    # what fit trained on: raw-f32 extraction + the fitted classifier
    feats = model.extract_device(cloud, search, attrs)
    from_fit = np.asarray(
        model.classifier.proba_device(jnp.asarray(feats))).argmax(1)

    # what serving produces for the same cloud under this config
    if search_mode == "designated":
        handle = model.stage_search(search, attributes=attrs)
        assert model.search_overflow(handle) == {
            "vox_dropped": 0, "interp_dropped": 0}
        staged = model.stage(cloud, staged_search=handle)
    else:
        staged = model.stage(cloud, attributes=attrs)
    assert staged is not None, "fused path must apply to this cell"
    served, diag = model.predict_staged(staged, with_diag=True)
    assert all(int(v) == 0 for v in diag.values()), dict(diag)
    served = np.asarray(served)[:cloud.shape[0]]

    if search_mode == "self" and transfer_dtype == "uint16":
        # quantized self-search upload: radius-shell points may flip
        agree = (from_fit == served).mean()
        assert agree >= 0.995, (kind, search_mode, transfer_dtype, agree)
    else:
        np.testing.assert_array_equal(
            from_fit, served,
            err_msg=f"cell ({kind}, {search_mode}, {transfer_dtype})")


LATTICE = [(kind, mode, dtype)
           for kind in ("minimal", "vector", "sazo")
           for mode in ("self", "designated")
           for dtype in ("uint16", "float32")]
# default-selection representatives: the round-4 bug cell (uint16
# designated -- the f32-upload contract) and a vector self-search cell
FAST_CELLS = {("minimal", "designated", "uint16"),
              ("vector", "self", "float32")}


@pytest.mark.parametrize("kind,mode,dtype",
                         [c for c in LATTICE if c in FAST_CELLS])
def test_fit_serve_agreement(kind, mode, dtype):
    _drive_cell(kind, mode, dtype)


@pytest.mark.slow
@pytest.mark.parametrize("kind,mode,dtype",
                         [c for c in LATTICE if c not in FAST_CELLS])
def test_fit_serve_agreement_full(kind, mode, dtype):
    _drive_cell(kind, mode, dtype)
