"""
Archive-driven training workflow for nimrud-tpu, end to end.

The reference drove this flow through interactive prompts
(reference: nimrud/prototypes/apc.py gmso_APC + multiclass_self +
vis_labels); here it is a script over the declarative workflow API:

  1. ingest a labeled scan into a CloudArchive (the directory-of-arrays
     store that replaces the reference's pickled APC),
  2. extract multiscale geometric features into a named asset,
  3. train + validate a classifier with balanced sampling (confusion
     matrix, user/producer accuracies),
  4. apply it to every point and export a colorized LAS for QA.

Run (CPU works; on TPU just run it):
    python examples/training.py
"""

import tempfile

import numpy as np

from nimrud_tpu.archive.store import CloudArchive
from nimrud_tpu.workflows import features as wf_features
from nimrud_tpu.workflows import train as wf_train
from nimrud_tpu.workflows import viz as wf_viz


def synthetic_site(n, rng):
    ground = rng.random((n // 2, 3)) * [60, 60, 0.15]
    walls = rng.random((n // 4, 3)) * [0.25, 10, 8] + [20, 20, 0]
    canopy = rng.normal([40, 40, 6], [8, 8, 1.5], (n // 4, 3))
    cloud = np.vstack([ground, walls, canopy]).astype(np.float32)[:n]
    labels = np.concatenate([
        np.zeros(n // 2, np.int32),
        np.ones(n // 4, np.int32),
        np.full(n // 4, 2, np.int32)])[:n]
    return cloud, labels


def main():
    rng = np.random.default_rng(0)
    cloud, labels = synthetic_site(40_000, rng)
    workdir = tempfile.mkdtemp(prefix="nimrud_training_")

    # --- 1. ingest ------------------------------------------------------
    archive = CloudArchive.create(f"{workdir}/site", cloud)
    archive.add_asset("labels", labels, np.arange(len(cloud)))
    print("archive:", archive.root, f"({len(cloud)} points)")

    # --- 2. features ------------------------------------------------------
    report = wf_features.extract_features(
        archive, scaleset=[(0.25, (0.5,)), (0.5, (1.0,)), (1.0, (2.0,))],
        kind="minimal", feature_name="gmso", label_asset="labels")
    print("features:", report)

    # --- 3. train + validate ---------------------------------------------
    result = wf_train.multiclass_train(
        archive, ["gmso"], "labels",
        wf_train.TrainConfig(
            classifier="linear",
            classifier_kwargs={"epochs": 20, "seed": 0},
            samples_per_class=5_000, validation_fraction=0.3, seed=0))
    print("confusion:\n", np.asarray(result["confusion"]))
    print("user accuracy:    ", np.round(result["user_accuracy"], 3))
    print("producer accuracy:", np.round(result["producer_accuracy"], 3))

    # --- 4. export for QA --------------------------------------------------
    out = wf_viz.export_classified_cloud(
        archive, result["result_asset"], f"{workdir}/classified.las",
        proba_asset=result["result_asset"] + "_proba")
    print("classified LAS:", out)


if __name__ == "__main__":
    main()
