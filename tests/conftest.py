"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), per SURVEY.md §4 — the reference
has no numerical test harness, so all numerics here are tested against
closed-form values and the naive autodiff oracle renderer.
"""

import os

# Must run before the first jax computation. NOTE: the environment's
# sitecustomize forces JAX_PLATFORMS=axon (the tunneled TPU); a plain env var
# here is NOT enough — jax.config.update below actually wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# Numerics tests check against closed-form values — use full f32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cache_growth():
    """Serial `pytest tests/` accumulates ~100+ Pallas-interpret executables
    in one process and eventually segfaults inside XLA compile (seen at
    test_stream_raster in rounds 1-2). Dropping compiled executables and
    collecting garbage at each module boundary bounds that growth."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
