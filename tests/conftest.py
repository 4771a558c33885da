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

# NO persistent compilation cache for the suite: XLA's CPU AOT
# serialize/deserialize is unreliable on this class of host — observed (a)
# intermittent segfaults inside executable.serialize() on multi-device
# (shard_map) executables mid-suite, (b) a deserialize segfault on a cache
# entry from a crashed run, and (c) cpu_aot_loader feature-mismatch warnings
# ("could lead to SIGILL") even on self-written entries. Cold compiles are
# deterministic; crashes are not.
