"""Model save/load round-trips and the profiling helpers."""

import numpy as np
import pytest

from nimrud_tpu.learning.linear import SoftmaxClassifier
from nimrud_tpu.learning.persistence import load_model, save_model
from nimrud_tpu.learning.rpt import RPTEnsemble
from nimrud_tpu.utils.profiling import RateTimer


RNG = np.random.default_rng(10)


def _blobs(n=300):
    centers = RNG.normal(size=(3, 5)) * 4
    labels = RNG.integers(0, 3, n)
    return (centers[labels] + RNG.normal(0, 0.5, (n, 5))).astype(
        np.float32), labels


def test_softmax_roundtrip(tmp_path):
    data, labels = _blobs()
    model = SoftmaxClassifier(epochs=20, seed=0)
    model.fit(data, labels)
    path = save_model(model, tmp_path / "clf")
    loaded = load_model(path)
    assert np.allclose(
        model.predict_proba(data), loaded.predict_proba(data), atol=1e-6)


def test_rpte_roundtrip(tmp_path):
    data, labels = _blobs(600)
    model = RPTEnsemble(n_estimators=4, seed=0)
    model.fit(data, labels)
    path = save_model(model, tmp_path / "forest.npz")
    loaded = load_model(path)
    assert np.allclose(
        model.predict_proba(data), loaded.predict_proba(data), atol=1e-6)


def test_unfitted_rejected(tmp_path):
    with pytest.raises(ValueError):
        save_model(SoftmaxClassifier(), tmp_path / "x")
    with pytest.raises(ValueError):
        save_model(RPTEnsemble(), tmp_path / "y")
    with pytest.raises(ValueError):
        save_model(object(), tmp_path / "z")


def test_rate_timer(capsys):
    timer = RateTimer("test")
    with timer:
        pass
    timer.add_points(1000).report()
    out = capsys.readouterr().out
    assert '"label": "test"' in out
    assert '"points": 1000' in out


def test_pipeline_roundtrip(tmp_path):
    # whole production model: scaleset + serving config + classifier
    from nimrud_tpu.learning.persistence import load_pipeline, save_pipeline
    from nimrud_tpu.pipeline import GeometryClassifier
    rng = np.random.default_rng(6)
    per = 500
    cloud = np.vstack([
        rng.random((per, 3)) * [8, 8, 0.02],
        rng.random((per, 3)) * [0.02, 0.02, 8] + [10, 4, 0],
        rng.normal([16, 4, 4], 1.0, (per, 3))]).astype(np.float32)
    labels = np.repeat([0, 1, 2], per)
    model = GeometryClassifier(
        [(0.2, (0.8, 0.4))], classifier="linear",
        classifier_kwargs={"epochs": 25, "seed": 0},
        transfer_dtype="uint16",
        bounds=(cloud.min(0) - 1, cloud.max(0) + 1))
    model.fit(cloud, labels)

    path = save_pipeline(model, tmp_path / "prod")
    loaded = load_pipeline(path)
    assert loaded.scaleset == model.scaleset
    assert loaded.transfer_dtype == "uint16"
    assert np.allclose(loaded.bounds[0], model.bounds[0])
    assert (loaded.predict(cloud) == model.predict(cloud)).all()

    with pytest.raises(ValueError):
        from nimrud_tpu.learning.persistence import save_model
        save_model(model.classifier, tmp_path / "clf_only")
        load_pipeline(tmp_path / "clf_only")
