"""Test harness config: run JAX on 8 virtual CPU devices.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): all sharding/collective code paths compile and execute on a
virtual 8-device host mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The ambient TPU plugin overrides JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2022)
