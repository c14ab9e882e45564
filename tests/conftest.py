"""Test harness: always run JAX on a virtual 8-device CPU mesh so sharding
paths compile and execute without TPU hardware.

The session image's sitecustomize registers the tunnelled TPU backend and
sets jax.config jax_platforms='axon,cpu' — config beats the JAX_PLATFORMS
env var, and a busy tunnel can stall backend init for minutes before the
cpu fallback kicks in.  So force the config here, before any test runs."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeat test runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_downpore")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
