"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device sharding tests run on the host platform
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring SURVEY.md §4's
multi-device test plan. Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.makedirs("/tmp/jax_cache", exist_ok=True)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Single-core VM: persistent compile cache amortizes XLA CPU compiles across
# test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
