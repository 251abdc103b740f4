"""Test harness: run everything on a fake 8-device CPU mesh.

This is the TPU-native substitute for the reference's absent distributed tests
(SURVEY.md §4): sharding/pjit paths are validated on
`--xla_force_host_platform_device_count=8` virtual devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
