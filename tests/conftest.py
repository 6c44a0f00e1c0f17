"""Test harness config: run all tests on a virtual 8-device CPU backend.

This is JAX's standard fake-backend trick for exercising pjit/Mesh/sharding
code paths without TPU pods (SURVEY.md §4e).

Note: this image's `sitecustomize` imports jax at interpreter startup with
`JAX_PLATFORMS=axon` (remote TPU tunnel), so setting env vars here is too
late for jax's config — we must override through `jax.config` before any
backend is initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: repeat suite runs skip most XLA-CPU compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
