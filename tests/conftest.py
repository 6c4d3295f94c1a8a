"""Test harness config.

Tests run on CPU with an 8-device virtual topology so sharding/collective code
paths compile and execute without TPU hardware (SURVEY.md §4 "Distributed").

Note: the environment may preload JAX with a TPU platform plugin at interpreter
start (sitecustomize), so ``JAX_PLATFORMS`` in the environment is too late —
we switch the platform through ``jax.config`` before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
