"""Test config: force an 8-device virtual CPU mesh before JAX import.

Mirrors the reference's DummyVecEnv-vs-ShmemVecEnv strategy (SURVEY.md section 4):
multi-chip sharding behavior is exercised on one host via
``--xla_force_host_platform_device_count``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
