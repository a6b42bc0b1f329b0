"""Persistent XLA compilation cache (jax_compilation_cache_dir).

Remote TPU compiles on this environment's relay cost 90-500 s per
program and dominate every benchmark stage's wall clock (round-4's
driver bench run timed out on compiles alone).  The persistent cache
round-trips through the relay's remote compile service: measured with
scripts/probe_compile_cache.py, a 21.06 s compile becomes a 0.11 s
cache hit in a fresh process.  CPU test-suite compiles cache the same
way, cutting repeat suite runs.

The cache is keyed by the serialized HLO + compile options + device
kind + jax version, so entries are only ever reused for an identical
program on identical hardware -- a hit is bit-for-bit the same
executable that a fresh compile would produce.

Opt-out: NIMRUD_NO_COMPILE_CACHE=1.  Relocate: NIMRUD_COMPILE_CACHE_DIR.
"""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compile_cache(cache_dir=None, min_compile_secs=1.0):
    """Point jax at the persistent compilation cache and return the
    directory used (None when disabled via NIMRUD_NO_COMPILE_CACHE).

    Safe to call any time before the first compile; idempotent.
    ``min_compile_secs`` keeps sub-second programs out of the cache --
    they recompile faster than a disk round-trip saves.
    """
    if os.environ.get("NIMRUD_NO_COMPILE_CACHE"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("NIMRUD_COMPILE_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:               # pragma: no cover - older jax
        return None
    return cache_dir
