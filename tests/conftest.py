"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4 item 5).

Must run before any jax import.  Small deterministic renders run on CPU;
the multi-device tests use the 8 virtual host devices as the stand-in for
a TPU slice.  Real-chip perf is exercised by bench.py, not pytest.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

# Force CPU: the ambient environment pins JAX to the axon TPU tunnel,
# which is the bench target, not the test target.  The env var alone is
# NOT enough — the axon sitecustomize calls register(), which does
# jax.config.update("jax_platforms", "axon,cpu") and overrides the env;
# re-update the config after import (backends are not initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Round-5: the full suite deterministically segfaulted inside
    XLA-CPU's backend_compile_and_load at the ~53rd test (twice, same
    spot; the same tests pass in any smaller grouping) — a jaxlib-0.9
    compiler-state exhaustion after ~a hundred compiled programs in one
    process.  Dropping compiled executables at module boundaries keeps
    the compiler's live-program count bounded; costs a few recompiles
    of cross-module shared programs."""
    yield
    jax.clear_caches()
