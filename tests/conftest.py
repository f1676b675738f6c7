"""Test harness config: force an 8-device virtual CPU platform.

Per SURVEY.md §4 item 4, sharding/mesh logic is tested on a virtual CPU mesh
(`xla_force_host_platform_device_count=8`); Pallas kernels run in interpret
mode on CPU. Real-TPU runs happen outside pytest (bench.py / manual).

NOTE: this sandbox presets JAX_PLATFORMS=axon (the remote TPU tunnel), so the
env var must be overwritten, not defaulted, and the config must be updated
after import as well — otherwise the whole test suite silently runs over the
TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from nadavca_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
