"""Test harness config: force CPU JAX with 8 virtual devices so sharding tests
run without a TPU pod (SURVEY.md §4d). Must run before jax imports."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite re-jits the same small shapes each run.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/fstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
