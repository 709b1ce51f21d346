"""Test configuration: force an 8-virtual-device CPU mesh.

Multi-chip logic (mesh builders, sharding rules, halo exchange, the jitted
distributed train step) is tested on a virtual CPU mesh — the strategy
SURVEY.md §4 calls for; real-TPU benchmarking happens in bench.py.

NOTE: on this machine jax is pre-imported at interpreter startup (a site
hook), so setting env vars here is too late; jax.config.update still works
because no backend has been initialized yet. The experimental 'axon' TPU
plugin also ignores JAX_PLATFORMS — jax_platform_name is what pins the
backend.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platform_name", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to the XLA flag (needs early env)
    pass

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform
    )
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(123)
