"""Test harness: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU plugin and imports jax
at interpreter startup, so the platform must be flipped here (before any
backend is instantiated) rather than via JAX_PLATFORMS.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# silence XLA:CPU AOT cache-load feature-mismatch LOG(ERROR) spam: cache
# entries written by the axon-site interpreter advertise compile-option
# pseudo-features (prefer-no-scatter/gather) the plain loader logs about
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's cost on CPU is dominated by
# kernel compiles (the crypto ops trace to many distinct small programs);
# warm re-runs drop from minutes to seconds.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
