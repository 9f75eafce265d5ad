"""Test harness config: force CPU JAX with 8 virtual devices so sharding tests
run without a TPU pod (SURVEY.md §4d). Must run before jax imports."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
