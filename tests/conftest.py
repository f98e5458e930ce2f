"""Test harness config: run everything on a virtual 8-device CPU mesh.

The standard fake-backend trick for testing TPU sharding without N chips
(SURVEY.md §4).  NOTE: in this image the ``XLA_FLAGS=
--xla_force_host_platform_device_count`` env var is ignored; the config calls
below are the working equivalent and must run before first jax use.
"""

import os

import jax

if os.environ.get("MCGMIL_TEST_TPU") != "1":
    # Default: 8-device CPU mesh.  MCGMIL_TEST_TPU=1 keeps the real TPU
    # backend for the hardware-only tests (e.g. the kernel's hardware-PRNG
    # dropout statistics, test_gated_attention_kernel.py).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)
