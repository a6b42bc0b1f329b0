"""
The benchmark workload and serving-program helpers shared by bench.py
and the trace/HLO tooling under scripts/.

These exist so the scripts stay bit-identical by construction: the
trace scripts attribute device ops to source lines by matching
fusion.NNN names against an AOT-compiled module, which only works when
every script builds EXACTLY the same program (same cloud shapes, same
specs, same model configuration).
"""

import numpy as np

BENCH_N_POINTS = 1_000_000
BENCH_EDGES = (0.25, 0.5, 1.0)
BENCH_RADII = (0.5, 1.0, 2.0)


def make_bench_cloud(n=BENCH_N_POINTS, seed=0):
    """The 1M-point outdoor LiDAR-style scene (BASELINE.md section 6):
    ground plane, eight building walls, vegetation canopy."""
    rng = np.random.default_rng(seed)
    ground = rng.random((n // 2, 3)) * [100, 100, 0.15]
    walls = [rng.random((n // 16, 3)) * [0.2, 12, 9]
             + [rng.random() * 90, rng.random() * 90, 0]
             for _ in range(8)]
    canopy = rng.normal([60, 60, 7], [15, 15, 2], (n // 4, 3))
    cloud = np.vstack([ground, *walls, canopy]).astype(np.float32)[:n]
    labels = np.concatenate([
        np.zeros(n // 2, np.int32),
        np.ones(8 * (n // 16), np.int32),
        np.full(n // 4, 2, np.int32)])[:n]
    return cloud, labels


def make_bench_model(cloud, backend="packed", precision="highest",
                     epochs=10, kind="minimal", classifier="linear",
                     classifier_kwargs=None, **kwargs):
    """The production serving configuration measured by bench.py.
    ``kind``/``classifier`` default to the headline workload; the
    variant benches (scripts/bench_rpte.py, scripts/bench_kind.py)
    override them and keep everything else identical."""
    from nimrud_tpu.pipeline import GeometryClassifier

    if classifier_kwargs is None:
        classifier_kwargs = {"epochs": epochs, "seed": 0} \
            if classifier == "linear" else {"seed": 0}
    scaleset = [(edge, (radius,))
                for edge, radius in zip(BENCH_EDGES, BENCH_RADII)]
    return GeometryClassifier(
        scaleset, kind=kind, classifier=classifier,
        classifier_kwargs=classifier_kwargs,
        transfer_dtype="uint16", backend=backend, precision=precision,
        bounds=(cloud.min(0), cloud.max(0)), trim_entries=True,
        **kwargs)


_PEAK_HBM_GBPS = {
    # advertised HBM bandwidth per chip (public spec-sheet numbers)
    "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0,
    "v4": 1228.0, "v6e": 1640.0,
}

_PEAK_BF16_TFLOPS = {"v5e": 197.0, "v5p": 459.0}

# Per-hotspot attribution of the 1M x 3-scale self-search serving step
# on v5e (scripts/trace_predict.py per-source-line device attribution;
# ROADMAP.md round-4/5 hotspot table).  Classes:
#   index -- XLA gather at its measured index-rate floor (~3.5 ms/M
#            indices); whether that rate tracks HBM bandwidth across
#            generations is the projection's main unknown
#   sort  -- bitonic sort networks (bandwidth + VPU mix)
#   vpu   -- elementwise/kernel compute (packed moment kernel, scans)
V5E_STEP_ATTRIBUTION = (
    ("candidate_gather_select", 9.4, "index"),
    ("packed_kernel", 7.8, "vpu"),
    ("unique_dedup_sorts", 6.7, "sort"),
    ("qt_gather", 6.25, "index"),
    ("plan_sorts", 5.0, "sort"),
    ("span_bounds_pair_gathers", 1.23, "index"),
    ("label_unsort", 1.55, "sort"),
    ("scans_and_small", 5.5, "vpu"),
)
V5E_ATTRIBUTION_WINDOW_MS = 56.2


def project_v5p(window_ms, n_points=BENCH_N_POINTS,
                attribution=V5E_STEP_ATTRIBUTION,
                attribution_window_ms=V5E_ATTRIBUTION_WINDOW_MS):
    """Project a measured v5e serving-step window onto v5p, per hotspot
    class, so the 100M pts/s north star (BASELINE.json targets v5p; the
    bench chip is v5e) is auditable on the target hardware's terms.

    The measured attribution table is rescaled to THIS run's window
    (same program, so proportional attribution), then each class is
    divided by a published v5e->v5p ratio under three scenarios:

      optimistic   -- index + sort rates scale with HBM bandwidth
                      (2765/819 = 3.38x), vpu with bf16 FLOPs
                      (459/197 = 2.33x)
      conservative -- everything scales only with the FLOPs ratio
                      (2.33x): memory-system gains don't reach the
                      gather index rate
      index_floor  -- gathers don't speed up at all (index-issue-rate
                      bound, generation-invariant); sorts/vpu at 2.33x

    Returns the scenario table + assumptions; the truth is bracketed by
    optimistic/index_floor since the gather index rate on v5p is not
    publicly documented.
    """
    hbm = _PEAK_HBM_GBPS["v5p"] / _PEAK_HBM_GBPS["v5e"]
    flops = _PEAK_BF16_TFLOPS["v5p"] / _PEAK_BF16_TFLOPS["v5e"]
    scenarios = {
        "optimistic": {"index": hbm, "sort": hbm, "vpu": flops},
        "conservative": {"index": flops, "sort": flops, "vpu": flops},
        "index_floor": {"index": 1.0, "sort": flops, "vpu": flops},
    }
    scale = window_ms / attribution_window_ms
    parts = [(name, ms * scale, cls) for name, ms, cls in attribution]
    other = max(window_ms - sum(ms for _, ms, _ in parts), 0.0)
    parts.append(("unattributed_other", other, "sort"))
    out = {
        "basis": {
            "measured_v5e_window_ms": round(window_ms, 3),
            "attribution_rescaled_from_ms": attribution_window_ms,
            "parts_ms": {n: round(ms, 2) for n, ms, _ in parts},
            "ratios": {"hbm_bw": round(hbm, 2),
                       "bf16_flops": round(flops, 2)},
        },
        "scenarios": {},
        "north_star_pts_per_sec": 1e8,
    }
    for name, ratios in scenarios.items():
        step = sum(ms / ratios[cls] for _, ms, cls in parts)
        rate = n_points / (step / 1e3)
        out["scenarios"][name] = {
            "step_ms": round(step, 2),
            "pts_per_sec": round(rate, 1),
            "pct_of_north_star": round(100.0 * rate / 1e8, 1),
        }
    return out


def _packed_lane_total(c_cap, e_cap, entry_chunk):
    """Static candidate lanes one band's packed gather moves per step:
    every entry slot (live or dead -- dead slots fetch the FAR sentinel
    row) costs its rank bucket's capacity.  Mirrors the bucket-edge
    arithmetic of span_host.candidate_caps_split / the device band_blocks."""
    if isinstance(c_cap, tuple):
        caps, bounds = c_cap
    else:
        caps, bounds = (int(c_cap),), ()
    chunk = e_cap if entry_chunk is None else int(entry_chunk)
    edges = (0,) + tuple(bounds) + (chunk,)
    total = 0
    for start in range(0, e_cap, chunk):
        length = min(chunk, e_cap - start)
        for cap, a, b in zip(caps, edges[:-1], edges[1:]):
            total += max(min(b, length) - min(a, length), 0) * cap
    return total


def roofline_payload(model, staged):
    """Single-touch payload model of the serving step's data movement:
    every major buffer counted ONCE per read + once per write at its
    STATIC (padded) device shape.  This is a LOWER bound on bytes the
    step moves through HBM (sorts make multiple passes; XLA may
    re-materialize); divide by the traced window for an achieved-GB/s
    floor that makes "the step is not bandwidth-bound" auditable.

    Returns a dict of per-movement byte counts plus totals."""
    from nimrud_tpu import pipeline

    specs = staged["specs"]
    n_q = int(staged["q_bucket"])
    n_s = int(staged["s_bucket"])
    rows = {}
    # shared query plan: qid sort carrying 3 coord payloads, the two
    # rank-compaction sorts (key+payload), the caller-order label sort
    rows["plan_sort"] = 2 * n_q * (4 + 12)
    rows["rank_sorts"] = 2 * 2 * n_q * (4 + 4)
    rows["label_unsort"] = 2 * n_q * (4 + 4)
    rows["unique_sorts"] = 0
    rows["span_tables"] = 0
    cand_lanes = 0
    qt_lanes = 0
    # the packed multi program runs EVERY band's span tables and
    # candidate gather over the SHARED pack plan (the finest band's
    # grid -- pipeline._fused_predict_step) -- the same basis the
    # multi-bucket caps/bounds were sized against, so lane counts must
    # use the pack spec's e_cap / entry chunk, not each band's own
    pack = min((s[1] for s in specs), key=lambda d: d.tile_edge)
    chunk = pipeline._serving_entry_chunk(
        pack.e_cap, pack.q_cap, model.serving_chunk_slots)
    for vox_spec, dev, radii, interp, v_cap, c_cap in specs:
        # per-band voxel dedup: key sort + (tile-id, key) compaction sort
        rows["unique_sorts"] += 2 * n_s * 4 + 2 * n_s * (4 + 4)
        sv = int(v_cap) if v_cap else n_s
        # span starts/lens scans + counts scatter over the band's search
        rows["span_tables"] += 2 * sv * 4 * 2
        if c_cap is not None:
            cand_lanes += _packed_lane_total(c_cap, pack.e_cap, chunk)
            qt_lanes = max(qt_lanes, pack.e_cap * pack.q_cap)
    # candidate pack gather: 4 B index read + 12 B row read + 12 B write
    rows["candidate_gather"] = cand_lanes * (4 + 12 + 12)
    # the kernel re-reads the packed block and the query block from HBM
    rows["kernel_reads"] = cand_lanes * 12 + qt_lanes * 12
    # shared (E, q_cap) query gather (once for all bands)
    rows["qt_gather"] = qt_lanes * (4 + 12 + 12)
    total = int(sum(rows.values()))
    return {
        "model": ("single-touch payload bytes at static device shapes "
                  "(lower bound; sorts counted one read+write pass)"),
        "movements_bytes": {k: int(v) for k, v in rows.items()},
        "candidate_lanes": int(cand_lanes),
        "qt_lanes": int(qt_lanes),
        "bytes_total": total,
        "bytes_per_point": round(total / max(int(staged["n_query"]), 1),
                                 1),
    }


def roofline_rates(payload, window_ms, device_str):
    """Fill in achieved GB/s vs the chip's peak HBM bandwidth."""
    out = dict(payload)
    gbps = payload["bytes_total"] / (window_ms * 1e-3) / 1e9
    out["window_ms"] = round(window_ms, 3)
    out["achieved_payload_gbps"] = round(gbps, 2)
    peak = next((v for k, v in _PEAK_HBM_GBPS.items()
                 if k in device_str.lower()), None)
    if peak:
        out["peak_hbm_gbps"] = peak
        out["pct_of_peak"] = round(100.0 * gbps / peak, 2)
    return out


def lower_predict(model, staged, with_proba=False):
    """AOT-lower the exact program `predict_staged` dispatches for this
    staged cloud (for compiled-HLO fetch / op-name attribution).

    Must mirror pipeline.predict_staged's call EXACTLY -- with_proba
    and chunk_slots are STATIC args that change the compiled program on
    the packed backend, and the trace tooling attributes device ops by
    matching fusion names against this lowering."""
    import jax
    import jax.numpy as jnp
    from nimrud_tpu import pipeline

    clf_kind, clf_params, clf_static = model._fused_classifier()
    return pipeline._fused_predict_step.lower(
        staged["query"],
        jnp.arange(staged["q_bucket"]) < staged["n_query"],
        staged["search"],
        jnp.arange(staged["s_bucket"]) < staged["n_search"],
        clf_params, staged["specs"], model.kind, None, model.precision,
        staged["n_query"], clf_kind, clf_static, staged["dequant"],
        staged.get("attributes"), model.vector_s_cap, model.backend,
        jax.default_backend() not in ("tpu", "axon"),
        with_proba=with_proba, chunk_slots=model.serving_chunk_slots,
        search_tables=staged.get("search_tables"))
