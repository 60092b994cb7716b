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


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
