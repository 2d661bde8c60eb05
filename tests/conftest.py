"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env BEFORE jax is imported anywhere. The real-TPU path is exercised by
bench.py and the driver's __graft_entry__ checks, not by unit tests.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin ignores JAX_PLATFORMS; the config update is what
# actually keeps tests off the real chip (and avoids its process lock).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent CPU compile cache: suite time is dominated by XLA compiles of
# the integrator/kernel programs, which are identical across runs — caching
# them makes steady-state suite runs several times faster. Thresholds at 0
# so even small programs cache.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "all")
