"""
End-to-end workflow tests: archive -> features -> train -> apply ->
evaluate -> export, plus the CLI surface.
"""

import json
import os

import numpy as np
import pytest

from nimrud_tpu import cli
from nimrud_tpu.archive.store import NULL_LABEL, CloudArchive
from nimrud_tpu.workflows import features as wf_features
from nimrud_tpu.workflows import train as wf_train
from nimrud_tpu.workflows import viz as wf_viz


RNG = np.random.default_rng(10)


def _make_archive(tmp_path, n_per=400, with_nulls=False):
    """Archive with geometrically distinct classes + labels."""
    sheet = RNG.random((n_per, 3)) * [6, 6, 0.02]
    line = RNG.random((n_per, 3)) * [0.02, 0.02, 6] + [8, 3, 0]
    blob = RNG.normal([14, 3, 3], 0.8, (n_per, 3))
    cloud = np.vstack([sheet, line, blob]).astype(np.float32)
    labels = np.repeat([0, 1, 2], n_per).astype(np.int32)
    if with_nulls:
        rows = RNG.permutation(len(labels))[:len(labels) // 2]
        labels = labels.copy()
        labels[rows] = NULL_LABEL
    archive = CloudArchive.create(tmp_path / "arc", cloud)
    archive.add_asset("labels", labels, np.arange(len(labels)))
    return archive, cloud, labels


def test_feature_workflow(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path)
    name = wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="geometric")
    data, index, meta = archive.get_asset(name)
    assert data.shape == (len(cloud), 8)
    assert meta["kind"] == "geometric"
    assert np.isfinite(data).all()


def test_vector_features_with_search_asset(tmp_path):
    # the reference's vmso_APC independent-search-cloud option: vector
    # features over a designated search subset carrying its own
    # attributes (reference: nimrud/prototypes/apc.py:2357-2529)
    archive, cloud, labels = _make_archive(tmp_path)
    attrs = RNG.random((len(cloud), 2)).astype(np.float32)
    archive.add_asset("attrs", attrs, np.arange(len(cloud)))
    subset = np.sort(RNG.permutation(len(cloud))[: len(cloud) // 2])
    archive.add_asset("subset",
                      np.zeros((subset.size, 1), np.float32), subset)

    name = wf_features.extract_features(
        archive, [(0.3, (1.0,))], kind="vector",
        attributes_asset="attrs", search_asset="subset")
    data, _, meta = archive.get_asset(name)
    assert data.shape == (len(cloud), 2)
    assert np.isfinite(data).all()
    assert meta["kind"] == "vector"

    # equals a direct extraction over the subset
    from nimrud_tpu.features.multiscale import extract_scaleset
    want = extract_scaleset(
        cloud, cloud[subset], [(0.3, (1.0,))], kind="vector",
        attributes=attrs[subset])
    assert np.allclose(data, want, atol=1e-5)

    # attributes that don't cover the search subset are rejected
    archive.add_asset("partial_attrs", attrs[: len(cloud) // 4],
                      np.arange(len(cloud) // 4))
    with pytest.raises(ValueError):
        wf_features.extract_features(
            archive, [(0.3, (1.0,))], kind="vector",
            attributes_asset="partial_attrs", search_asset="subset",
            overwrite=True)


def test_feature_workflow_skip_sampling(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, with_nulls=True)
    name = wf_features.extract_features(
        archive, [(0.3, (0.5,))], kind="minimal",
        label_asset="labels", unlabeled_fraction=0.1, seed=0)
    data, index, _ = archive.get_asset(name)
    labeled = (labels != NULL_LABEL).sum()
    assert labeled <= len(index) < len(cloud)
    # every labeled point got features
    assert np.isin(np.nonzero(labels != NULL_LABEL)[0], index).all()


def test_feature_workflow_partitioned_matches_whole(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, n_per=250)
    whole = wf_features.extract_features(
        archive, [(0.3, (0.5,))], kind="minimal", feature_name="whole")
    parts = wf_features.extract_features(
        archive, [(0.3, (0.5,))], kind="minimal", feature_name="parts",
        partition_max_population=400)
    a, _, _ = archive.get_asset("whole")
    b, _, _ = archive.get_asset("parts")
    # identical up to fp32 path differences (counts may flip at radius
    # boundaries between differently-centered computations)
    pop_match = a[:, 0] == b[:, 0]
    assert pop_match.mean() > 0.99
    assert np.allclose(a[pop_match], b[pop_match], atol=5e-3)


def test_automatic_out_of_core_matches_in_core(tmp_path):
    # a tiny synthetic HBM budget forces the automatic buffered-
    # partition loop; features must match the unconstrained extraction
    # (the reference's GPU-memory budget check, mso.py:375-466)
    archive, cloud, labels = _make_archive(tmp_path)
    whole = wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="geometric",
        feature_name="whole")
    auto = wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="geometric",
        feature_name="auto_ooc", hbm_budget_bytes=32 * 1024 ** 2)
    data_w, _, _ = archive.get_asset(whole)
    data_a, _, _ = archive.get_asset(auto)
    # density columns pin the neighbor sets; a few boundary points may
    # flip shells between the two f32 paths -- values compared where
    # populations agree (same contract as the other equivalence tests)
    pop = [0, 4]
    agree = np.all(np.isclose(data_a[:, pop], data_w[:, pop],
                              rtol=1e-6), axis=1)
    assert agree.mean() > 0.99, agree.mean()
    assert np.allclose(data_a[agree], data_w[agree], atol=5e-4), \
        np.abs(data_a[agree] - data_w[agree]).max()

    from nimrud_tpu.utils.memory import (
        auto_partition_population, projected_fused_bytes)
    # a generous budget decides to run in one piece
    assert auto_partition_population(
        len(cloud), len(cloud), [(0.3, (1.0,))],
        budget=64 * 1024 ** 3) is None
    # projections are monotone in cloud size
    small = projected_fused_bytes(1000, 1000, [(0.3, (1.0,))])
    big = projected_fused_bytes(1_000_000, 1_000_000, [(0.3, (1.0,))])
    assert big > small > 0


def test_train_workflow(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path)
    wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="geometric",
        feature_name="geo")
    report = wf_train.multiclass_train(
        archive, ["geo"], "labels",
        wf_train.TrainConfig(classifier="linear",
                             classifier_kwargs={"epochs": 25}))
    assert report["validation_accuracy"] > 0.85, report["confusion"]
    predicted, index, meta = archive.get_asset(report["result_asset"])
    assert predicted.shape == (len(cloud),)
    assert "confusion" in meta
    proba, _, _ = archive.get_asset(report["result_asset"] + "_proba")
    assert proba.shape == (len(cloud), 3)
    assert np.allclose(proba.sum(1), 1.0, atol=1e-3)


def test_binary_and_resampler_and_fa(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, n_per=250)
    wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="minimal", feature_name="f")

    report = wf_train.binary_train(
        archive, ["f"], "labels", positive_class=1,
        config=wf_train.TrainConfig(
            classifier="linear", classifier_kwargs={"epochs": 25}))
    assert report["b_completeness"] > 70

    stats = wf_train.balance_resampler(
        archive, ["f"], "labels", repeats=2,
        config=wf_train.TrainConfig(
            classifier="linear", classifier_kwargs={"epochs": 10}))
    assert stats["mean_confusion"].shape == (3, 3)

    fa_name = wf_train.factor_analysis(archive, ["f"], 3)
    reduced, _, _ = archive.get_asset(fa_name)
    assert reduced.shape[1] == 3


def test_apply_classifier(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, n_per=250)
    wf_features.extract_features(
        archive, [(0.3, (1.0, 0.5))], kind="minimal", feature_name="f")
    report = wf_train.multiclass_train(
        archive, ["f"], "labels",
        wf_train.TrainConfig(classifier="linear",
                             classifier_kwargs={"epochs": 25}))
    name = wf_train.apply_classifier(
        archive, report["classifier"], ["f"], result_asset="applied")
    applied, _, _ = archive.get_asset("applied")
    stored, _, _ = archive.get_asset(report["result_asset"])
    assert np.array_equal(applied, stored)


def test_viz_exports(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, n_per=150)
    wf_features.extract_features(
        archive, [(0.3, (0.5,))], kind="minimal", feature_name="f")
    report = wf_train.multiclass_train(
        archive, ["f"], "labels",
        wf_train.TrainConfig(classifier="linear",
                             classifier_kwargs={"epochs": 10}))

    csv_path = wf_viz.export_classified_cloud(
        archive, report["result_asset"], tmp_path / "out.csv",
        proba_asset=report["result_asset"] + "_proba")
    exported = np.loadtxt(csv_path, delimiter=",")
    assert exported.shape == (len(cloud), 6)

    # suffix-routed binary exports
    from nimrud_tpu.archive import io as cloud_io
    ply_path = wf_viz.export_classified_cloud(
        archive, report["result_asset"], tmp_path / "out.ply")
    assert cloud_io.load_ply(ply_path).shape == (len(cloud), 6)
    las_path = wf_viz.export_classified_cloud(
        archive, report["result_asset"], tmp_path / "out.las")
    las_cloud, las_cls = cloud_io.load_las(
        las_path, with_classification=True)
    assert las_cloud.shape == (len(cloud), 7)
    predicted, _, _ = archive.get_asset(report["result_asset"])
    assert np.array_equal(las_cls, predicted)

    png = wf_viz.confusion_plot(report["confusion"], tmp_path / "conf.png")
    assert os.path.getsize(png) > 0

    edges, counts = wf_viz.voxel_population_curve(
        cloud, [0.25, 0.5, 1.0])
    assert (np.diff(counts) <= 0).all(), "coarser voxels, fewer cells"

    data, _, _ = archive.get_asset("f")
    png2 = wf_viz.embedding_plot(
        data, labels, tmp_path / "emb.png", sample=200)
    assert os.path.getsize(png2) > 0


def test_dataset_tools(tmp_path):
    from nimrud_tpu.workflows import datasets

    sheet = RNG.random((200, 3)) * [4, 4, 0.02]
    blob = RNG.normal([8, 2, 2], 0.5, (200, 3))
    extra = RNG.random((100, 3)) * 4 + [12, 0, 0]

    archive = datasets.build_from_class_files(
        tmp_path / "arc",
        [(0, sheet), (1, blob)],
        search_sources=[extra])
    labels, index, meta = archive.get_asset("labels")
    assert archive.manifest["num_points"] == 500
    assert (labels == 0).sum() == 200
    assert (labels == 999).sum() == 100
    assert meta["classes"] == [0, 1]

    # feature join / chop / snip / collapse
    archive.add_asset("f1", RNG.random((300, 2)).astype(np.float32),
                      np.arange(300))
    archive.add_asset("f2", RNG.random((400, 3)).astype(np.float32),
                      np.arange(400) + 50)
    merged = datasets.merge_assets(archive, ["f1", "f2"], "joined")
    data, index, _ = archive.get_asset(merged)
    assert data.shape == (250, 5)
    assert index[0] == 50

    chopped = datasets.chop_asset(archive, "joined", [0, 2, 4])
    data, _, _ = archive.get_asset(chopped)
    assert data.shape == (250, 3)

    snipped = datasets.snip_asset(archive, "joined", np.arange(100))
    data, idx, _ = archive.get_asset(snipped)
    assert np.all(idx < 100) and len(idx) == 50

    collapsed = datasets.collapse_labels(
        archive, "labels", {1: 0})
    new_labels, _, _ = archive.get_asset(collapsed)
    assert (new_labels == 1).sum() == 0
    assert (new_labels == 0).sum() == 400
    assert (new_labels == 999).sum() == 100


def test_binary_trees_embedding(tmp_path):
    archive, cloud, labels = _make_archive(tmp_path, n_per=200)
    wf_features.extract_features(
        archive, [(0.3, (1.0,))], kind="minimal", feature_name="f")
    report = wf_train.binary_train(
        archive, ["f"], "labels", positive_class=2,
        config=wf_train.TrainConfig(
            classifier="linear", classifier_kwargs={"epochs": 15},
            trees_embedding=True))
    assert report["b_completeness"] > 60


def test_cli_end_to_end(tmp_path, capsys):
    cloud = np.vstack([
        RNG.random((300, 3)) * [6, 6, 0.02],
        RNG.random((300, 3)) * [0.02, 0.02, 6] + [8, 3, 0],
        RNG.normal([14, 3, 3], 0.8, (300, 3))]).astype(np.float32)
    labels = np.repeat([0, 1, 2], 300)
    cloud_file = tmp_path / "cloud.csv"
    label_file = tmp_path / "labels.npy"
    np.savetxt(cloud_file, cloud, delimiter=",", fmt="%.6f")
    np.save(label_file, labels)
    arc = str(tmp_path / "arc")

    cli.main(["ingest", arc, str(cloud_file), "--labels", str(label_file)])
    out = json.loads(capsys.readouterr().out)
    assert out["points"] == 900

    cli.main(["features", arc, "--scales", "0.3:1.0,0.5",
              "--kind", "geometric", "--name", "geo"])
    out = json.loads(capsys.readouterr().out)
    assert out["feature_asset"] == "geo"

    cli.main(["train", arc, "--features", "geo",
              "--classifier", "linear",
              "--classifier-kwargs", '{"epochs": 25}',
              "--name", "pred"])
    out = json.loads(capsys.readouterr().out)
    assert out["validation_accuracy"] > 0.8

    cli.main(["evaluate", arc, "--predicted", "pred", "--truth", "labels"])
    out = json.loads(capsys.readouterr().out)
    assert out["accuracy"] > 0.8

    out_csv = str(tmp_path / "colored.csv")
    cli.main(["export", arc, "--labels", "pred", "-o", out_csv,
              "--proba", "pred_proba"])
    assert json.loads(capsys.readouterr().out)["written"] == out_csv

    cli.main(["info", arc])
    manifest = json.loads(capsys.readouterr().out)
    assert "pred" in manifest["assets"]
