"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference (Jetson-SLAM) has no tests; our strategy (SURVEY.md §4) is
per-kernel unit tests against NumPy oracles plus sequence-level integration
tests on synthetic scenes.  Multi-chip sharding is validated on a virtual
CPU mesh per JAX's standard trick.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env points at the TPU tunnel
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize registers the axon TPU plugin before
# conftest runs; the env var alone does not win, so force the platform here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
