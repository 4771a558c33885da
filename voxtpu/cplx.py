"""Complex arithmetic as (re, im) real-array pairs.

TPU hardware has no complex element types (XLA rejects C64/C128 on TPU for
most ops, and Pallas kernels are real-valued), so all complex math in voxtpu
runs on explicit (re, im) pairs of real arrays. The formulas mirror the
`num-complex` crate used by the reference so that root-finder parity holds:

- division uses the naive (re*re+im*im) formula (num-complex `Div`),
- `norm` is hypot, `arg` is atan2,
- `sqrt` is the principal branch via polar form (see also the reference's own
  `SquareRoot for Complex<T>`, /root/reference/src/complex.rs:13-18),
- `inv` is conj/norm_sqr (num-complex `inv()`).

All functions broadcast over arbitrary batch shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "C",
    "cmul",
    "cdiv",
    "cadd",
    "csub",
    "cneg",
    "cconj",
    "cinv",
    "cnorm",
    "cnorm_sqr",
    "carg",
    "csqrt",
    "creal_const",
    "to_polar",
    "from_polar",
]


class C(NamedTuple):
    """A complex value as a pair of real arrays."""

    re: jax.Array
    im: jax.Array


def creal_const(value, like: jax.Array) -> C:
    """Lift a real constant to a complex pair with `like`'s dtype/shape rules."""
    v = jnp.asarray(value, dtype=jnp.asarray(like).dtype)
    return C(v, jnp.zeros_like(v))


def cadd(a: C, b: C) -> C:
    return C(a.re + b.re, a.im + b.im)


def csub(a: C, b: C) -> C:
    return C(a.re - b.re, a.im - b.im)


def cneg(a: C) -> C:
    return C(-a.re, -a.im)


def cconj(a: C) -> C:
    return C(a.re, -a.im)


def cmul(a: C, b: C) -> C:
    return C(a.re * b.re - a.im * b.im, a.re * b.im + a.im * b.re)


def cdiv(a: C, b: C) -> C:
    # num-complex naive division: (a * conj(b)) / |b|^2
    nrm = b.re * b.re + b.im * b.im
    return C((a.re * b.re + a.im * b.im) / nrm, (a.im * b.re - a.re * b.im) / nrm)


def cnorm_sqr(a: C) -> jax.Array:
    return a.re * a.re + a.im * a.im


def cnorm(a: C) -> jax.Array:
    return jnp.hypot(a.re, a.im)


def carg(a: C) -> jax.Array:
    return jnp.arctan2(a.im, a.re)


def to_polar(a: C) -> tuple[jax.Array, jax.Array]:
    return cnorm(a), carg(a)


def from_polar(r: jax.Array, theta: jax.Array) -> C:
    return C(r * jnp.cos(theta), r * jnp.sin(theta))


def cinv(a: C) -> C:
    nrm = cnorm_sqr(a)
    return C(a.re / nrm, -a.im / nrm)


def csqrt(a: C) -> C:
    """Principal complex square root via polar form (complex.rs:13-18)."""
    r, theta = to_polar(a)
    return from_polar(jnp.sqrt(r), theta * 0.5)
