"""
Profiling and throughput observability.

The reference's observability was wall-clock prints scattered through
every pipeline (reference: nimrud/prototypes/mso.py:359-364,
apc.py:673-676, minimal/multiscale.py:36-65).  Here:

  * :class:`RateTimer` -- structured points/sec reporting;
  * :func:`trace` -- a context manager around ``jax.profiler`` that dumps
    a TensorBoard/Perfetto device trace of the wrapped region;
  * :func:`device_track_stats` -- parse such a trace into device BUSY
    time, the honest compute measurement on hosts whose dispatch is
    asynchronous and whose ``block_until_ready`` does not await
    dispatched work (this environment's relay-attached TPU).
"""

import contextlib
import glob
import gzip
import json
import os
import time


class RateTimer:
    """Accumulates (points, seconds) and reports throughput."""

    def __init__(self, label="pipeline"):
        self.label = label
        self.points = 0
        self.seconds = 0.0
        self._started = None

    def __enter__(self):
        self._started = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._started
        self._started = None

    def add_points(self, n):
        self.points += int(n)
        return self

    @property
    def rate(self):
        return self.points / self.seconds if self.seconds else 0.0

    def report(self, printer=print):
        printer(json.dumps({
            "label": self.label,
            "points": self.points,
            "seconds": round(self.seconds, 4),
            "points_per_sec": round(self.rate, 1),
        }))
        return self


@contextlib.contextmanager
def trace(log_dir="/tmp/nimrud_trace"):
    """
    Capture a device trace of the enclosed region:

        with profiling.trace("/tmp/trace"):
            model.predict(cloud)

    View with TensorBoard's profile plugin or Perfetto.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _device_events(trace_dir):
    """Yield (thread_name, op_name, ts_us, dur_us) for every complete
    event on a device (TPU) track of the newest perfetto trace under
    ``trace_dir``.  Raises if the trace holds no device events."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as handle:
        events = json.load(handle).get("traceEvents", [])

    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name.upper() or "device:" in name.lower()}

    found = False
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        found = True
        thread = tid_names.get((e["pid"], e.get("tid")), "")
        yield (thread, e.get("name", ""), float(e.get("ts", 0.0)),
               float(e.get("dur", 0.0)))
    if not found:
        raise ValueError(
            "no device-track events in trace; tracks seen: "
            + ", ".join(sorted(set(pid_names.values()))))


def device_op_table(trace_dir, top=20):
    """Aggregate the device "XLA Ops" track by op name: returns a list of
    (total_ms, count, name) rows, largest first.  The place to look when
    the window number says the device is slower than it should be."""
    import collections

    total = collections.Counter()
    count = collections.Counter()
    for thread, name, _, dur in _device_events(trace_dir):
        low = thread.lower()
        if "step" in low or "module" in low:
            continue
        total[name] += dur
        count[name] += 1
    return [(round(us / 1e3, 3), count[name], name)
            for name, us in total.most_common(top)]


def device_track_stats(trace_dir):
    """
    Parse a perfetto ``*.trace.json.gz`` written by :func:`trace` into
    ``(busy_us, window_us)`` over the device (TPU) "XLA Ops" track:
    ``busy_us`` sums per-op durations, ``window_us`` spans first op start
    to last op end (includes gaps).  The "XLA Modules" and step tracks
    are excluded -- they re-cover the same device time and would double
    count.  Raises if the trace holds no device events.
    """
    begins, ends, busy = [], [], 0.0
    for thread, _, ts, dur in _device_events(trace_dir):
        low = thread.lower()
        if "step" in low or "module" in low:
            continue
        busy += dur
        begins.append(ts)
        ends.append(ts + dur)
    if not begins:
        raise ValueError("no XLA Ops events on the device track")
    return busy, max(ends) - min(begins)
