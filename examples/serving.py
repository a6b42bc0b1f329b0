"""
Production serving pattern for nimrud-tpu, end to end.

Train once, persist the whole pipeline model, then serve a stream of
clouds transfer-disciplined: fixed site bounds keep every cloud on ONE
compiled program, uint16 quantized uploads halve transfer volume,
staging overlaps host prep + H2D with device compute, and labels are
downloaded in one batch after the stream drains.

Run (CPU works; on TPU just run it):
    python examples/serving.py
"""

import numpy as np

from nimrud_tpu.learning.persistence import load_pipeline, save_pipeline
from nimrud_tpu.pipeline import GeometryClassifier


def synthetic_site(n, rng):
    """Ground plane + walls + canopy, like an outdoor LiDAR scan."""
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
    # demo-sized; production clouds run the same code path (the bench
    # uses 1M points)
    cloud, labels = synthetic_site(60_000, rng)

    # --- fit once, with fixed site bounds (recompile-free serving) ----
    site_bounds = (cloud.min(0) - 2.0, cloud.max(0) + 2.0)
    model = GeometryClassifier(
        scaleset=[(0.25, (0.5,)), (0.5, (1.0,)), (1.0, (2.0,))],
        kind="minimal", classifier="linear",
        classifier_kwargs={"epochs": 10, "seed": 0},
        transfer_dtype="uint16",        # half the upload volume
        bounds=site_bounds,
        trim_entries=True)              # e_cap from measured occupancy
    model.fit(cloud, labels, sample=50_000)
    path = save_pipeline(model, "/tmp/nimrud_site_model")
    print("model saved:", path)

    # --- serving process: load + stream ------------------------------
    served = load_pipeline(path)
    scans = (cloud + np.float32([0.05 * i, 0.02 * i, 0])
             for i in range(4))         # stand-in for a sensor feed
    label_arrays = list(served.predict_stream(scans))

    # ONE batched download at the end (host reads are expensive on
    # remote-attached devices)
    predicted = [np.asarray(out) for out in label_arrays]
    accuracy = float((predicted[0] == labels).mean())
    print(f"served {len(predicted)} clouds; first-scan accuracy "
          f"{accuracy:.3f}")


if __name__ == "__main__":
    main()
