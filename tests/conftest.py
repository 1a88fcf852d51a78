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
# persistent compile cache: the suite re-jits many (sampler, model) pairs
# CPU-only cache dir: the TPU remote-compile helper writes CPU AOT entries
# with a different machine-feature set into the shared dir
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
