"""Test configuration: run all tests on a simulated 8-device CPU mesh.

Must set env vars before jax is imported anywhere.

SEGMIF_TEST_PLATFORM=tpu opts a run OUT of the CPU forcing so TPU-only
tests (bf16 drift — the jax>=0.9 CPU backend cannot execute bf16 dots) can
execute on real hardware:  SEGMIF_TEST_PLATFORM=tpu pytest tests/test_bf16_drift.py
"""
import os

_TPU_RUN = os.environ.get("SEGMIF_TEST_PLATFORM") == "tpu"

if not _TPU_RUN:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # the axon TPU plugin ignores JAX_PLATFORMS in this image; set the
    # legacy var and the in-process config too so tests really run on CPU
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax
import numpy as np
import pytest

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
    # fp32 tests verify numerics; don't let the backend drop matmuls to bf16
    jax.config.update("jax_default_matmul_precision", "highest")

# The suite's wall time is ~90% XLA:CPU compiles of model-sized jits on the
# single-core host. Enable the persistent compilation cache (same dir as
# bench.py) so repeat runs — the common case for a dev loop and for the
# driver — skip recompiles; the first-ever run pays full cost. Disable
# with SEGMIF_TEST_NO_CACHE=1 for a cold-compile timing.
if not os.environ.get("SEGMIF_TEST_NO_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
