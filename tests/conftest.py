"""Test harness: always run JAX on a virtual 8-device CPU mesh so sharding
paths compile and execute without TPU hardware (the session environment may
point JAX_PLATFORMS at a tunnelled TPU; tests must not depend on it)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: repeat test runs skip XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_downpore")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
