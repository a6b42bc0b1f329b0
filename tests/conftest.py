"""
Test configuration.

Tests run on a simulated 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benchmarks run on the real chip).

These environment variables must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import jax

# Force CPU: this box's sitecustomize registers the remote TPU (axon)
# backend at interpreter start and overrides JAX_PLATFORMS, so the env var
# alone is not enough -- the config update after import is authoritative.
# The TPU has no float64 and every op would be a network round-trip.
jax.config.update("jax_platforms", "cpu")

# float64 oracles in tests need x64; library code is dtype-explicit and
# stays float32/int32 regardless
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite's wall time on this 1-core
# host is dominated by CPU compiles of the heavy mesh/pipeline programs;
# warm repeat runs skip them (entries are keyed by HLO + platform, so
# CPU test entries coexist with the bench's TPU entries).
from nimrud_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(10)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop jit/compilation caches after each test module.

    A full-suite run accumulates hundreds of live compiled XLA:CPU
    executables in one process; deep into the suite (deterministically
    at the 178th test, an unrelated large program's compile)
    XLA:CPU's backend_compile segfaults.  The same test passes alone
    or after any ~50-test subset.  Dropping cache references between
    modules keeps the live-executable population bounded; within-module
    reuse (where almost all intentional cache hits are) is unaffected.
    """
    yield
    jax.clear_caches()
