"""Wave utilities: RMS, amplitude, normalization, preemphasis.

TPU-native re-design of the reference's slice traits
(``/root/reference/src/waves.rs``): every op is a batched reduction or scan
over a trailing sample axis, so a whole corpus of frames runs as one fused
XLA program instead of a per-slice Rust loop.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["rms", "amplitude", "max_amplitude", "normalize", "preemphasis"]


def rms(x: jax.Array, axis: int = -1) -> jax.Array:
    """Root-mean-square over `axis`: sqrt(sum(x^2)/n).

    Reference: RMS for [S] (waves.rs:14-23).
    """
    x = jnp.asarray(x)
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=axis))


def amplitude(x: jax.Array) -> jax.Array:
    """Elementwise absolute value. Reference: Amplitude (waves.rs:29-37)."""
    return jnp.abs(jnp.asarray(x))


def max_amplitude(x: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """Maximum absolute value over `axis`. Reference: MaxAmplitude (waves.rs:44-59)."""
    return jnp.max(jnp.abs(jnp.asarray(x)), axis=axis, keepdims=keepdims)


def normalize(x: jax.Array, max_amp: jax.Array | None = None, axis: int = -1) -> jax.Array:
    """Scale so the maximum absolute value becomes 1.

    `max_amp`, if given, is used directly as the divisor (matching
    `normalize_with_max(Some(max))`, waves.rs:68-76, which divides by the
    provided value as-is, sign included).
    """
    x = jnp.asarray(x)
    if max_amp is None:
        max_amp = max_amplitude(x, axis=axis, keepdims=True)
    return x / max_amp


def preemphasis(x: jax.Array, factor: float, axis: int = -1) -> jax.Array:
    """Reference-exact preemphasis filter.

    The reference (waves.rs:86-96) iterates **backwards**, adding the
    *already-updated* following sample scaled by `2*pi*factor`:

        y[n-1] = x[n-1]
        y[i]   = x[i] + (2*pi*factor) * y[i+1]

    i.e. a first-order linear recurrence running from the end of the buffer.
    `factor` is `center_frequency / sample_rate` (waves.rs:80-81). Note this is
    *not* the textbook `x[n] - a*x[n-1]` preemphasis; it is reproduced exactly
    for parity (the idiosyncratic sign/direction are observable in MFCC
    outputs, see spectrum.rs:583).

    TPU mapping: a first-order recurrence is a `jax.lax.associative_scan`
    (log-depth), batched over all leading axes.
    """
    x = jnp.asarray(x)
    c = jnp.asarray(2.0 * math.pi * factor, dtype=x.dtype)
    xr = jnp.flip(x, axis=axis)

    # h[k] = c * h[k-1] + xr[k], h[-1] = 0  ==  y reversed.
    a = jnp.full_like(xr, c)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, xr), axis=axis)
    return jnp.flip(h, axis=axis)
