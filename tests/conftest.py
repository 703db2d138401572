"""Test fixture: force CPU with 8 virtual devices (SURVEY.md section 4 item 4
— the standard JAX fake-multinode fixture).  Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the suite is defined on CPU-8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
