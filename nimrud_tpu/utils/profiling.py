"""
Profiling and throughput observability.

The reference's observability was wall-clock prints scattered through
every pipeline (reference: nimrud/prototypes/mso.py:359-364,
apc.py:673-676, minimal/multiscale.py:36-65).  Here:

  * :class:`RateTimer` -- structured points/sec reporting;
  * :func:`trace` -- a context manager around ``jax.profiler`` that dumps
    a TensorBoard/Perfetto device trace of the wrapped region.
"""

import contextlib
import json
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
