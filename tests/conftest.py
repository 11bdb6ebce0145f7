"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated on
XLA's host platform with 8 virtual devices (SURVEY.md section 4 item 4).  The
env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# jax_platforms="axon,cpu" at interpreter start, overriding the env var —
# override it back after import (backends are not initialized yet here).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent CPU compilation cache: the suite is compile-dominated (~30 min
# cold, CI-timeout territory — VERDICT r3 item 7); cached re-runs drop the
# per-test XLA compiles.  Safe under pytest-xdist (the cache is per-entry
# file-locked by jax).  CI restores this dir via actions/cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() >= 8, (
    "tests expect the 8-virtual-device CPU mesh; got "
    f"{jax.devices()} — check XLA_FLAGS handling in conftest.py"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
