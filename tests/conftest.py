"""Test configuration: CPU backend, float64 parity mode, 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard JAX mechanism for
testing `jax.sharding.Mesh` layouts without real chips. Numeric parity tests
run in float64 (the reference is f64 end-to-end in its tests).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU platform; tests run on CPU so
# that float64/complex128 parity paths are available.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite is XLA-compile dominated (~40 jitted pipeline variants); cache
# compilations across runs.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
