"""Test configuration: force CPU with 8 virtual devices.

Mirrors the standard JAX fake-backend pattern so mesh/sharding tests run
without a real TPU slice (the reference has no distributed tests at all;
SURVEY.md section 4 calls this out as the gap to fill).

The environment's sitecustomize registers a remote-TPU PJRT plugin and
force-prepends it to ``jax_platforms`` regardless of the JAX_PLATFORMS env
var, so we must override the config *after* importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
