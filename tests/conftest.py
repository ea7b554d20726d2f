"""Test configuration: CPU backend, float64, 8 virtual devices.

The idiomatic JAX way to test sharded scans without a pod: 8 fake CPU devices
via ``--xla_force_host_platform_device_count`` (SURVEY.md §4).  Must run
before any JAX backend initialization, hence at conftest import time.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-bound (dozens of
# distinct jitted programs); caching makes re-runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
