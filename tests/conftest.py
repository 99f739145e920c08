"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-device tests use the standard JAX fake-backend trick
(``--xla_force_host_platform_device_count``) so the pmap/pjit paths are
exercised without TPU hardware (SURVEY.md §4c).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
