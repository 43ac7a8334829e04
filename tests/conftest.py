"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (the driver
separately dry-runs the multichip path); unit tests must not depend on TPU
availability.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so the env var is already snapshotted — we must use
jax.config.update, which works as long as no backend has initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
