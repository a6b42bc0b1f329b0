"""
Benchmark orchestrator: end-to-end multiscale feature extraction +
classification throughput on one chip.  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "points/sec", "vs_baseline": N}

This process NEVER touches the TPU.  Every measurement runs in its own
subprocess (scripts/bench_*.py), each of which prints one JSON line and
hard-exits -- relay-attached TPU processes can hang in teardown after
heavy use, and round 4's bench timed out with nothing printed because
the orchestrator waited on hung children.  Two defenses here:

  * a GLOBAL deadline (NIMRUD_BENCH_DEADLINE_SEC, default 1500 s):
    stages run in priority order, each time-boxed to the smaller of its
    own cap and the time remaining; stages that don't fit are recorded
    as {"skipped": "deadline"} instead of dying;
  * a stage that prints its JSON and then hangs is still harvested --
    the timeout kill collects the output written so far.

Stage order (priority = what BASELINE.md's target table needs first):
  1. headline    -- the 1M-point x 3-scale production serving step,
                    device-trace window (scripts/bench_headline.py);
                    includes the roofline + v5p north-star projection
  2. designated  -- streamed serving against a staged search map
                    (scripts/bench_designated.py)
  3. large 10M   -- BASELINE config 3 with held-out accuracy
                    (scripts/bench_large.py)
  4. rpte        -- the flagship RPT-ensemble classifier inside the
                    traced serving step (scripts/bench_rpte.py)

Variant measurements that are too slow to re-run every round (feature
kinds, the density-contrast sweep) are committed as BENCH_VARIANTS.json
/ BENCH_DENSITY.json by their scripts and embedded in the detail block,
labeled as prior measured runs.

Baseline: the reference's minimal pipeline runs ~5,000 points/sec *per
scale* on one CPU core (reference: nimrud/minimal/README.md:4), i.e.
~1,667 points/sec end-to-end at three scales.  vs_baseline is measured
against that.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
DEADLINE = float(os.environ.get("NIMRUD_BENCH_DEADLINE_SEC", "1500"))
MARGIN = 20.0                      # parent assembly + final print
BASELINE_PTS_PER_SEC = 5000.0 / 3

# (key, script, cap_sec, min_sec, skip_env)
STAGES = (
    ("headline", "bench_headline.py", 840, 300, None),
    ("designated_search_stream", "bench_designated.py", 540, 240,
     "NIMRUD_BENCH_SKIP_DESIGNATED"),
    ("large_scale_10m", "bench_large.py", 840, 300,
     "NIMRUD_BENCH_SKIP_LARGE"),
    ("rpte_serving", "bench_rpte.py", 540, 240,
     "NIMRUD_BENCH_SKIP_RPTE"),
)

T0 = time.monotonic()


def _remaining():
    return DEADLINE - (time.monotonic() - T0) - MARGIN


def _text(maybe_bytes):
    if isinstance(maybe_bytes, bytes):
        return maybe_bytes.decode("utf-8", "replace")
    return maybe_bytes or ""


def _last_json_line(text):
    """The last parseable {...} stdout line.  Malformed/truncated JSON
    lines are skipped and earlier lines tried (a killed child can leave
    a partial final line on top of a complete earlier one)."""
    for line in reversed(_text(text).strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_stage(script, timeout):
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    path = os.path.join(HERE, "scripts", script)
    note = None
    try:
        proc = subprocess.run(
            [sys.executable, path], capture_output=True, text=True,
            timeout=timeout, env=env)
        out, err = proc.stdout, proc.stderr
        if proc.returncode != 0:
            note = f"rc={proc.returncode}"
    except subprocess.TimeoutExpired as exc:
        # harvest anything printed before the kill: a child that hangs
        # in TPU teardown AFTER its JSON still yields a result
        out, err = _text(exc.stdout), _text(exc.stderr)
        note = f"killed at stage timeout {timeout:.0f}s"
    except Exception as error:      # pragma: no cover - spawn failure
        return {"error": str(error)[:200]}
    result = _last_json_line(out)
    if result is None:
        tail = (err or "no output").strip()[-300:]
        return {"error": f"{note or 'no JSON line'}: {tail}"}
    if note:
        result["orchestrator_note"] = note
    return result


def _committed(name):
    """A committed prior measurement (clearly labeled as such)."""
    path = os.path.join(HERE, name)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as handle:
            return json.load(handle)
    except Exception:
        return None


def main():
    results, walls = {}, {}
    for key, script, cap, min_sec, skip_env in STAGES:
        if skip_env and os.environ.get(skip_env):
            results[key] = {"skipped": "env"}
            continue
        left = _remaining()
        if left < min_sec:
            results[key] = {"skipped": "deadline",
                            "remaining_sec": round(left, 1)}
            continue
        start = time.monotonic()
        results[key] = _run_stage(script, min(cap, left))
        walls[key] = round(time.monotonic() - start, 1)

    head = results.get("headline") or {}
    if "value" in head:
        metric, rate = head["metric"], head["value"]
        vs = head["vs_baseline"]
    else:
        # headline failed: fall back to the best stage that measured a
        # device rate, so the round still records a real number
        rate, metric, vs = None, "benchmark failed (see detail)", None
        for key in ("designated_search_stream", "large_scale_10m"):
            sub = results.get(key) or {}
            if "points_per_sec_device" in sub:
                rate = sub["points_per_sec_device"]
                metric = (f"{key} device rate (headline stage failed: "
                          f"{str(head.get('error'))[:120]})")
                vs = round(rate / BASELINE_PTS_PER_SEC, 1)
                break

    detail = {
        "designated_search_stream": results.get(
            "designated_search_stream"),
        "large_scale_10m": results.get("large_scale_10m"),
        "rpte_serving": results.get("rpte_serving"),
        "budget": {
            "deadline_sec": DEADLINE,
            "elapsed_sec": round(time.monotonic() - T0, 1),
            "stage_walls_sec": walls,
        },
    }
    for key in ("trace", "roofline", "projected_v5p", "stages_sec",
                "n_points", "scales", "train_accuracy", "device",
                "backend", "timing_semantics", "error"):
        if key in head:
            detail[key] = head[key]

    # flagship-classifier cost, hoisted for the record (live run first,
    # committed prior measurement as fallback)
    rpte = results.get("rpte_serving") or {}
    variants = _committed("BENCH_VARIANTS.json")
    if "window_ms_per_step" in (rpte.get("trace") or {}):
        detail["rpte_step_ms"] = rpte["trace"]["window_ms_per_step"]
    elif variants and "rpte_serving" in variants:
        prior = variants["rpte_serving"].get("trace") or {}
        if "window_ms_per_step" in prior:
            detail["rpte_step_ms"] = prior["window_ms_per_step"]
            detail["rpte_step_ms_source"] = "committed prior run"
    committed = {}
    if variants:
        committed["variants"] = variants
    density = _committed("BENCH_DENSITY.json")
    if density:
        committed["density_contrast"] = density
    if committed:
        committed["note"] = ("prior measured runs committed by their "
                             "scripts (too slow to re-run per round); "
                             "see each block's device/date stamp")
        detail["committed"] = committed

    print(json.dumps({
        "metric": metric,
        "value": rate,
        "unit": "points/sec",
        "vs_baseline": vs,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
