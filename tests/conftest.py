"""Test configuration.

Multi-device coverage without a pod: an 8-device virtual CPU mesh via
``--xla_force_host_platform_device_count`` (the reference has *no* multi-node
tests at all — SURVEY §4 calls this out as a gap the build must close).
Float64 is enabled so statistical tests compare against the Julia reference's
Float64 semantics; the framework itself is dtype-agnostic.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite re-jits many (sampler, model) pairs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
