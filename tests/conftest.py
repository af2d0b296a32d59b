"""Test config: force CPU with 8 virtual devices (simulated mesh).

SURVEY.md §4: jax.sharding tests simulate an 8-way mesh with
xla_force_host_platform_device_count. The environment's sitecustomize
registers a TPU PJRT plugin in every process and sets JAX_PLATFORMS=axon,
so we override via jax.config *before any backend is initialized* (jax is
already imported at conftest time, but no backend is live yet).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
