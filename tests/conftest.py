"""Test configuration: run on CPU with 8 virtual devices and float64.

Mirrors the reference's serial-oracle testing practice (SURVEY.md §4): the
multi-device sharded path is exercised on a virtual CPU mesh and compared
against the single-device result.
"""
import os

# Force CPU: the session env may point JAX at the (single, tunnelled) TPU via
# JAX_PLATFORMS=axon; unit tests must run fast and with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session exports JAX_PLATFORMS=axon (tunnelled TPU); the env var set
# above can lose the race, so force the platform through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
