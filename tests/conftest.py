"""Test harness config: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count) so no real TPU pod is needed.
This must run before any `import jax` in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS with
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so the
# env var alone does NOT force CPU here — re-assert it through the config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Numerical tests compare against float64 references; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_collection_modifyitems(config, items):
    """Auto-mark everything not 'slow' as 'fast' so `-m fast` selects the
    CI-grade subset (SURVEY §4 / VERDICT round-1 item 9: the full suite
    does not fit this 1-core host's budget)."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
