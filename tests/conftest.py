"""Test harness config: force CPU JAX with 8 virtual devices so sharding tests
run without a TPU pod (SURVEY.md §4d). Must run before jax imports."""

import os
import sys

# repo root on sys.path regardless of pytest's invocation dir: tests import
# retired-experiment kernels from tools/ (namespace package)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# hard-set (not setdefault): the harness exports JAX_PLATFORMS=axon, and the
# suite must run on CPU with virtual devices (SURVEY.md §4d)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: the suite re-jits the same small shapes each run.
import jax  # noqa: E402

# The TPU plugin registers itself from sitecustomize before conftest runs, so
# the env var alone is too late — force the platform through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/fstpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
