"""Test harness: run everything on a virtual 8-device CPU mesh.

The image's sitecustomize force-registers the axon TPU platform and exports
JAX_PLATFORMS=axon, so a plain setdefault is not enough — override the env
AND the live jax config before any array op.  Real-TPU execution is
exercised by bench.py / __graft_entry__.py; unit and parity tests must be
hardware independent and able to fake multi-chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(566)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled programs between test modules.

    A single pytest process compiles hundreds of XLA CPU programs across
    the suite; the accumulated jit cache has segfaulted the in-process
    CPU compiler near the end of full runs (observed at test ~86/92,
    backend_compile_and_load).  Per-module cache clearing keeps the
    process footprint bounded; within a module, caching still avoids
    recompiles."""
    yield
    jax.clear_caches()
