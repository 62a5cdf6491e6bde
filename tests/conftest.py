"""Test config: run everything on a virtual 8-device CPU mesh.

The axon TPU plugin in this image overrides the ``JAX_PLATFORMS`` env var, so
we must force the CPU backend through jax.config BEFORE any test imports jax
utilities, and request 8 virtual host devices via XLA_FLAGS (which must be in
the environment before the CPU client initializes).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
