"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's fixed-seed policy (tests/conftest.py:7-8, SEED=123456)
and adds what the reference cannot test: multi-device sharding on a host-CPU
mesh (xla_force_host_platform_device_count=8).

Note: the environment's sitecustomize pre-imports jax and registers the axon
TPU platform, so env-var overrides are too late — we switch platforms via
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

SEED = 123456


@pytest.fixture
def rng():
    return np.random.default_rng(SEED)


@pytest.fixture
def key():
    return jax.random.PRNGKey(SEED)
