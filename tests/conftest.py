"""Test fixture: force CPU with 8 virtual devices (SURVEY.md section 4 item 4
— the standard JAX fake-multinode fixture).  Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the suite is defined on CPU-8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by a pytest plugin before this conftest runs
# (seen with JAX_PLATFORMS=axon exported); the config update still wins as
# long as no backend has been initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "test suite must run on CPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
