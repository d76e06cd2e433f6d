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

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_enable_x64", False)
# NO persistent compile cache: XLA:CPU AOT deserialization SEGFAULTS
# reproducibly on this platform (SIGSEGV inside
# compilation_cache.get_executable_and_time on reads mid-suite — both with
# cross-host stale entries and with entries written fresh the same day).
# The suite compiles cold (~15-20 min on the 1-core VM); correctness over
# speed.


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU also segfaults *compiling* a large scan program late in the
    suite (hundreds of live executables; the same test passes in a fresh
    process).  Dropping compiled programs between modules keeps the
    in-process state small."""
    jax.clear_caches()
    yield
