"""Kernel backend selection: Pallas on TPU, plain-XLA jnp elsewhere.

Every hot op has two implementations with identical semantics: a jnp twin
(the CPU float64 parity path, also the shard_map-friendly fallback) and a
Pallas TPU kernel. Tests use "pallas_interpret" to pin them to each other.
"""

from __future__ import annotations

import jax

__all__ = ["default_backend"]


def default_backend() -> str:
    """"pallas" when the default JAX backend is a TPU (incl. the axon
    tunnel), else "jnp"."""
    try:
        return "pallas" if jax.default_backend() in ("tpu", "axon") else "jnp"
    except Exception:
        return "jnp"
