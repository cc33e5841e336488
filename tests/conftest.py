"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4 item 6)."""

import os

# Must be set before jax backends initialize. The image pins JAX_PLATFORMS=axon
# via a site hook, so the env var alone is not enough — we also update the jax
# config below.
os.environ["JAX_PLATFORMS"] = "cpu"
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
