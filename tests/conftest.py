"""Test harness: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU plugin and imports jax
at interpreter startup, so the platform must be flipped here (before any
backend is instantiated) rather than via JAX_PLATFORMS.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
