"""Test harness config: force an 8-device virtual CPU platform.

Per SURVEY.md §4 item 4, sharding/mesh logic is tested on a virtual CPU mesh
(`xla_force_host_platform_device_count=8`); Pallas kernels run in interpret
mode on CPU. Real-TPU runs happen outside pytest (bench.py / manual).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
