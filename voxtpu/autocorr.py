"""Batched autocorrelation, FFT-based, with the reference's seed quirk.

The reference (``/root/reference/src/periodic.rs:276-289``) computes a naive
O(n*lags) autocorrelation with a quirk: the accumulator is *seeded with
x[0]* (not x[0]*x[lag]) and the i=0 term is skipped, so

    r[lag] = x[0] + sum_{i=1}^{n-1-lag} x[i] * x[i+lag]
           = AC_true[lag] - x[0]*x[lag] + x[0]

(The doctest example in periodic.rs:258-264 claims `[-1, -1]` for
`[1, .5, 0, -.5, -1].autocorrelate(2)`; the actual code yields `[2.5, 1.5]` —
doctests are disabled in the reference, Cargo.toml:15.)

TPU mapping: one batched rFFT -> |.|^2 -> irFFT over the frame axis (O(n log n)
on the VPU/MXU-friendly XLA FFT), plus the closed-form additive correction to
match the reference bit-for-bit. `quirk=False` gives the textbook result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["autocorrelate", "power_and_autocorrelate"]


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@functools.lru_cache(maxsize=8)
def _icos_matrix(nfft: int, n_out: int) -> "np.ndarray":
    """Inverse-DFT-of-real-even-spectrum as a cosine matrix: the first n_out
    lags of irfft(power) equal power @ M with
    M[k, lag] = s_k * cos(2*pi*k*lag/nfft) / nfft, s_k = 1 for k in {0, n/2}
    else 2. On TPU this (half+1, n_out) matmul runs on the MXU several times
    faster than the XLA irfft."""
    import numpy as np

    half = nfft // 2 + 1
    k = np.arange(half)[:, None]
    lag = np.arange(n_out)[None, :]
    m = np.cos(2.0 * np.pi * k * lag / nfft) / nfft
    m[1 : half - 1] *= 2.0
    return m  # float64; cast to the working dtype at use


def power_and_autocorrelate(
    x: jax.Array, n_coeffs: int | None = None, quirk: bool = True,
    use_matmul_ifft: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Autocorrelation plus the half power spectrum it was computed from.

    For power-of-two frames nfft == 2n, so the n-point FFT bins the MFCC
    filterbank needs are exactly the even bins of this power spectrum
    (X_n[k] == X_2n[2k] for a zero-padded real frame) — one batched FFT
    serves both features. Returns (power (..., nfft//2+1), ac (..., n_coeffs)).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n_coeffs is None:
        n_coeffs = n
    nfft = _next_pow2(2 * n)
    spec = jnp.fft.rfft(x, n=nfft, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(x.dtype)
    if use_matmul_ifft is None:
        # Measured on v5e: the f32 cosine matmul is slower than XLA's irfft at
        # these shapes (f32 MXU throughput); keep the FFT. The option remains
        # for bf16-tolerant callers.
        use_matmul_ifft = False
    if use_matmul_ifft:
        m = jnp.asarray(_icos_matrix(nfft, n_coeffs), dtype=x.dtype)
        ac = jax.lax.dot_general(
            power, m, (((power.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    else:
        ac = jnp.fft.irfft(power, n=nfft, axis=-1)[..., :n_coeffs].astype(x.dtype)
    if quirk:
        x0 = x[..., :1]
        ac = ac - x0 * x[..., :n_coeffs] + x0
    return power, ac


def autocorrelate(x: jax.Array, n_coeffs: int | None = None, quirk: bool = True) -> jax.Array:
    """Autocorrelation along the last axis.

    Args:
      x: (..., n) samples.
      n_coeffs: number of lags to return (default n). Must be <= n, as in the
        reference where longer requests would underflow (periodic.rs:281).
      quirk: reproduce the reference seed-term quirk exactly (default). With
        False, returns the textbook linear autocorrelation.

    Returns:
      (..., n_coeffs) autocorrelation coefficients.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n_coeffs is None:
        n_coeffs = n
    if n_coeffs > n:
        raise ValueError(f"n_coeffs ({n_coeffs}) must be <= frame length ({n})")

    nfft = _next_pow2(2 * n)
    spec = jnp.fft.rfft(x, n=nfft, axis=-1)
    power = spec * jnp.conj(spec)
    ac = jnp.fft.irfft(power, n=nfft, axis=-1)[..., :n_coeffs]
    ac = ac.astype(x.dtype)

    if quirk:
        x0 = x[..., :1]
        ac = ac - x0 * x[..., :n_coeffs] + x0
    return ac
