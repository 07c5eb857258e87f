"""Test configuration: force an 8-device virtual CPU platform.

Must run before the first `import jax` anywhere in the test session —
pytest imports conftest.py first, so setting the env here is sufficient.
TPU-style multi-device sharding is then testable host-only
(SURVEY.md §4: the TPU-less stand-in for ICI).
"""

import os

# NOTE: this sandbox pre-imports jax via sitecustomize with a TPU (axon)
# backend registered, so env vars alone don't switch platforms — the
# config update below does.  XLA_FLAGS must still be set before the CPU
# client is instantiated (first jax op), which pytest guarantees here.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
try:
    # reuse compiled programs across test runs: the interpret-mode Pallas
    # compiles dominate suite wall time and are identical run to run
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(777)
