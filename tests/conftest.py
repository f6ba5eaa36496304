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


@pytest.fixture()
def rng(request):
    """Function-scoped, seeded from the test id: every test gets the same
    stream regardless of which other tests ran before it (a session-scoped
    shared rng made statistical assertions depend on suite subsetting)."""
    import zlib

    return np.random.default_rng(zlib.adler32(request.node.nodeid.encode()))


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches():
    """Drop compiled executables between test modules.

    Most jitted entry points are keyed on an OrbFrontend/module instance
    (static argnum), so cross-module cache reuse is near zero — but the
    cache still pins every dead instance's executables.  After ~70 tests
    the accumulated XLA:CPU JIT state made a later large fused-program
    compile segfault inside LLVM; clearing per module keeps the compiler
    arena bounded without measurable recompile cost."""
    yield
    jax.clear_caches()
