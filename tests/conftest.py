"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends, hence the top-of-file
placement and the sitecustomize-style ordering.
"""
import os

import jax

# The axon sitecustomize registers a TPU backend in every python process and
# env vars (JAX_PLATFORMS / XLA_FLAGS force_host_platform_device_count) are
# overridden by it under this JAX version — the config API before backend
# init is the only route that actually yields 8 CPU devices (verified).
# EGONN_TEST_TPU=1 keeps the real TPU backend instead (for the on-chip
# validation tier, tests/test_banded_tpu.py).
if os.environ.get("EGONN_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# The environment defaults to degraded (bf16-class) matmul precision, matching the
# TPU MXU's native pass. Golden numeric tests need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: compiles in this environment are slow (remote
# service); caching makes repeat test runs fast.
from egonn_tpu.utils.compcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(jax.config)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
