"""Test harness config.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §7 / task brief): real
TPU hardware is not needed for correctness tests, and 8 virtual devices let
sharding tests exercise multi-chip paths. This must run before jax is
imported anywhere; the axon TPU tunnel plugin (.axon_site) is stripped
because it wedges host transfers when the cpu platform is forced.
"""

import os
import sys

# If a TPU-tunnel sitecustomize already imported jax at interpreter startup
# (it registers a remote PJRT plugin that wedges host transfers under a
# forced-cpu platform), re-exec the test process with a clean environment.
# Env vars must be set before jax import to take effect, so mutation here
# would be too late — re-exec is the only reliable path.
if "jax" in sys.modules and os.environ.get("_PFRL_TPU_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["_PFRL_TPU_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    # Cache only jax-level executables, not XLA:CPU AOT blobs (their
    # machine-feature check logs a wall of benign errors on reload).
    env.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ""
# Persistent compile cache: XLA-CPU first-compiles dominate test wall-clock
# otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(42)


@pytest.fixture
def np_random():
    return np.random.RandomState(42)
