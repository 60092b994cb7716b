"""Test configuration: run all tests on a simulated 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the axon TPU plugin ignores JAX_PLATFORMS in this image; set the legacy
# var and the in-process config too so tests really run on host CPU
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
# fp32 tests verify numerics; don't let the backend drop matmuls to bf16
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
