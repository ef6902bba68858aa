"""Test configuration: run on a simulated 8-device CPU mesh with x64 enabled.

Multi-device behavior is tested the standard JAX way
(``--xla_force_host_platform_device_count``); x64 matches the float64 NumPy
oracles that mirror the reference implementation.
"""
import os

# Force the CPU backend: the sandbox pre-sets JAX_PLATFORMS=axon (remote TPU
# tunnel) and registers it from sitecustomize at interpreter start, which is
# the bench target but far too slow for the test suite. jax.config.update
# below overrides it even though the plugin is already registered.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The XLA CPU backend segfaults inside ``backend_compile_and_load``
    after ~175 modules' worth of compilations accumulate in one process
    (r4: reproduced twice at ~93-98% of the grown suite, with and
    without the native extension loaded; 126 GB RAM free, so not
    memory pressure). Dropping the caches at module boundaries keeps the
    per-process executable count bounded; cross-module cache reuse was
    negligible anyway (each module compiles its own shapes)."""
    yield
    import jax

    jax.clear_caches()
