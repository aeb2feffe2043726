"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the idiomatic JAX stand-in for multi-chip hardware (SURVEY.md §4):
sharding semantics, collectives, and mesh layouts compile and execute
identically on virtual CPU devices.

The environment's axon site hook registers the TPU backend at interpreter
startup (before this file runs) and pins ``jax_platforms='axon,cpu'``, so
setting the env var alone is not enough: we also override the jax config
after import, before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
