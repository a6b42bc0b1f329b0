"""Sweep harness smoke test (tiny CPU configuration)."""

import numpy as np

from nimrud_tpu.workflows.sweep import sweep_extraction, synthetic_scan


def test_synthetic_scan_shape():
    cloud = synthetic_scan(10_000, extent=50.0)
    assert cloud.shape == (10_000, 3)
    assert cloud.dtype == np.float32
    assert cloud[:, 2].max() < 20


def test_sweep_ranks_configs():
    cloud = synthetic_scan(6_000, extent=30.0)
    results = sweep_extraction(
        cloud=cloud, scaleset=[(0.5, (1.0,))], n_points=6_000,
        repeats=1, tile_factors=(2,), capacities=(None,),
        entry_batches=(64,), methods=("tiled", "dense"), verbose=False)
    good = [r for r in results if "error" not in r]
    assert len(good) == 2
    assert all(r["point_scales_per_sec"] > 0 for r in good)
    # sorted best-first
    rates = [r["point_scales_per_sec"] for r in good]
    assert rates == sorted(rates, reverse=True)


def test_plan_report_occupancy():
    from nimrud_tpu.features.multiscale import plan_report
    cloud = synthetic_scan(8_000, extent=30.0)
    scaleset = [(0.5, (1.0,)), (1.0, (2.0,))]
    for method in ("tiled", "fused"):
        report = plan_report(cloud, cloud, scaleset, method=method)
        assert len(report) == 2
        for band in report:
            assert 0 < band["entries_live"] <= band["e_cap"]
            assert 0 < band["entry_fill"] <= 1
            assert 0 < band["q_slot_fill"] <= 1
            assert band["q_cap"] > 0 and band["s_cap"] > 0
    # trimmed fused plan must beat the worst-case grid bound on a
    # clustered cloud (the whole point of the occupancy estimate)
    fused = plan_report(cloud, cloud, scaleset, method="fused")
    assert any(b["e_cap"] < b["e_cap_worst_case"] for b in fused)


def test_sweep_reports_entry_fill():
    cloud = synthetic_scan(6_000, extent=30.0)
    results = sweep_extraction(
        cloud=cloud, scaleset=[(0.5, (1.0,))], repeats=1,
        tile_factors=(2,), capacities=(None,), entry_batches=(64,),
        methods=("tiled", "dense"), verbose=False)
    by_method = {r["method"]: r for r in results if "error" not in r}
    fill = by_method["tiled"]["entry_fill"]
    assert fill is not None and len(fill) == 1 and 0 < fill[0] <= 1
    assert by_method["dense"]["entry_fill"] is None


def test_sweep_trace_capture(tmp_path):
    from nimrud_tpu.workflows.sweep import sweep_extraction, synthetic_scan
    trace_dir = str(tmp_path / "trace")
    ranked = sweep_extraction(
        cloud=synthetic_scan(3000, extent=20), repeats=1,
        tile_factors=(3,), capacities=(64,), entry_batches=(128,),
        verbose=False, trace_dir=trace_dir)
    assert ranked and "error" not in ranked[0]
    import os
    found = [f for _, _, files in os.walk(trace_dir) for f in files]
    assert found, "no trace files captured"
