"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh — the TPU-world equivalent of
"multi-node without a real cluster" (SURVEY.md §4). Note the axon TPU
plugin ignores the JAX_PLATFORMS env var, so the platform must be forced
through jax.config before any backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the jitted train step takes ~2 min to
# compile on CPU; cached runs make the suite fast after the first pass.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
