"""Complex LPC roots -> resonances (formant candidates).

Reference: `Resonance::from_root` and `ToResonance`
(``/root/reference/src/spectrum.rs:149-210``). Batched: a root batch maps to
(frequency, bandwidth, valid) arrays in one elementwise pass; sorting happens
on masked keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from voxtpu.cplx import C, cconj, cinv, to_polar

__all__ = ["resonances_from_roots", "sort_and_pack_resonances"]


def resonances_from_roots(
    roots: C,
    sample_rate: float,
    require_im_positive: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Map roots to (frequency, bandwidth, valid), elementwise.

    Reference semantics (spectrum.rs:166-192):
      - roots with im >= 0 qualify (`find_formants` additionally pre-filters
        im > 0 strictly, lib.rs:95 — the default here);
      - |z| > 1 is reflected inside the unit circle via conj(z)^-1;
      - freq = theta * sr / 2pi, bw = -2 * ln(r) * sr / 2pi;
      - keep only 50 < freq < nyquist - 50.
    """
    sr = sample_rate
    freq_mul = sr / (2.0 * math.pi)
    r, theta = to_polar(roots)
    refl = cinv(cconj(roots))
    r2, theta2 = to_polar(refl)
    outside = r > 1.0
    r = jnp.where(outside, r2, r)
    theta = jnp.where(outside, theta2, theta)

    freq = freq_mul * theta
    bw = -2.0 * freq_mul * jnp.log(r)

    nyquist = sr * 0.5
    im_ok = roots.im > 0 if require_im_positive else roots.im >= 0
    valid = im_ok & (freq > 50.0) & (freq < nyquist - 50.0)
    # f32 fast mode: pathological frames can push Laguerre to inf/nan roots;
    # treat them as non-resonances rather than poisoning the tracker.
    valid = valid & jnp.isfinite(freq) & jnp.isfinite(bw)
    zero = jnp.zeros_like(freq)
    return jnp.where(valid, freq, zero), jnp.where(valid, bw, zero), valid


def sort_and_pack_resonances(
    freq: jax.Array, bw: jax.Array, valid: jax.Array, capacity: int
) -> tuple[jax.Array, jax.Array]:
    """Pack valid resonances to the front (root order), then sort by frequency.

    Mirrors find_formants' fixed `[Resonance; MAX_RESONANCES]` buffer fill +
    prefix sort (lib.rs:55, 94-111): invalid slots stay zero-valued at the
    back. Returns (freq, bw) of shape (..., capacity).
    """
    n = freq.shape[-1]
    # ONE variadic stable sort replaces the reference's two phases (pack
    # valid-first in root order, lib.rs:94-105, then sort the prefix by
    # frequency, lib.rs:106-111): key = freq for valid, +inf for invalid
    # gives the identical final order — valid ascending by frequency with
    # ties in root order, invalid at the back (zeroed below either way).
    # Payloads ride the sort network, so no argsort + take_along_axis
    # gathers (TPU gathers serialize on the scalar unit).
    key = jnp.where(valid, freq, jnp.inf)
    _key, freq_s, bw_s, valid_s = jax.lax.sort(
        (key, freq, bw, valid), dimension=-1, is_stable=True, num_keys=1
    )
    freq_s = jnp.where(valid_s, freq_s, 0.0)
    bw_s = jnp.where(valid_s, bw_s, 0.0)

    batch = freq.shape[:-1]
    if n >= capacity:
        return freq_s[..., :capacity], bw_s[..., :capacity]
    pad = [(0, 0)] * len(batch) + [(0, capacity - n)]
    return jnp.pad(freq_s, pad), jnp.pad(bw_s, pad)
