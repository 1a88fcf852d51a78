"""Test configuration.

The suite runs on an 8-device *virtual CPU mesh*
(``--xla_force_host_platform_device_count``), giving multi-device coverage
without a pod — coverage the reference lacks entirely (SURVEY §4: ``prun``
is untested there).  Float64 is enabled so statistical tests compare against
the Julia reference's Float64 semantics; the framework itself is
dtype-agnostic.

NOTE: the platform must be forced via ``jax.config.update`` (not the
JAX_PLATFORMS env var): on axon-tunneled TPU terminals a sitecustomize hook
re-registers ``jax_platforms="axon,cpu"`` inside every interpreter, which
would silently route the whole test suite through the TPU tunnel.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compile cache: on this box the axon sitecustomize routes
# even CPU compiles through the remote-compile helper, whose executables
# run fine in-process but SEGFAULT on disk-cache deserialization
# (backend.deserialize_executable inside
# compilation_cache.get_executable_and_time — reproduced at full-suite
# scale with both shared and fresh private cache dirs).  Compiling fresh
# each run costs ~1 min over the warm-cache time and is deterministic.

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between test modules.

    The XLA CPU compiler segfaults (deterministically, inside
    backend_compile_and_load on the heaviest program, RMLMC) once a single
    process has accumulated the full suite's worth of live executables —
    reproduced with and without the persistent cache and with and without
    the axon plugin.  Releasing executables per module keeps the process
    well under the limit; cross-module jit reuse is minimal so the time
    cost is noise."""
    yield
    jax.clear_caches()


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
