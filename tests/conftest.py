"""Test config: force an 8-device virtual CPU mesh before JAX backend init.

Mirrors the reference's DummyVecEnv-vs-ShmemVecEnv strategy (SURVEY.md section 4):
multi-chip sharding behavior is exercised on one host via
``--xla_force_host_platform_device_count``.

The container boots with an axon TPU PJRT plugin pre-registered
(JAX_PLATFORMS=axon via sitecustomize); tests must run on local CPU — every
dispatch to the tunneled TPU is ~1000x slower — so we override the platform at
the config level, which wins over the plugin registration.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
