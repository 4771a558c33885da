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

#: Every explicit backend name (None = auto). "x3" = the 3-pass bf16 matmul
#: algorithm (opt-in, 1e-6-class accuracy — PARITY deviation 12);
#: "_interpret" = Pallas interpret mode for CPU tests.
_BACKENDS = frozenset(
    ["fft", "ct", "ct_fused", "ct_fused_interpret", "ct_fused_x3",
     "ct_fused_x3_interpret"]
)


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def power_and_autocorrelate(
    x: jax.Array, n_coeffs: int | None = None, quirk: bool = True,
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Autocorrelation plus the n-point half power spectrum, one transform.

    For power-of-two frames nfft == 2n, so the n-point FFT bins the MFCC
    filterbank needs are exactly the even bins of the 2n-point power spectrum
    (X_n[k] == X_2n[2k] for a zero-padded real frame) — one batched transform
    serves both features. Returns (half_power (..., n//2+1), ac (..., n_coeffs)).

    backend:
      "fft"      — XLA rfft/irfft (exact parity; the CPU default).
      "ct"       — four-step Cooley-Tukey matmul decomposition on the MXU
                   (voxtpu.ops.ct_fft; 1.8x faster on v5e at HIGHEST matmul
                   precision, max divergence ~2e-7 relative in f32).
      "ct_fused" — the same decomposition as ONE Pallas kernel with all stage
                   intermediates VMEM-resident (voxtpu.ops.ct_fused_pallas);
                   the TPU default when the shape supports it (nfft == 2n,
                   n % 128 == 0). "ct_fused_interpret" for CPU tests.
      None       — auto per voxtpu.backend.default_backend().
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if n_coeffs is None:
        n_coeffs = n
    nfft = _next_pow2(2 * n)

    from voxtpu.ops.ct_fft import ct_supported
    from voxtpu.ops.ct_fused_pallas import ct_fused_supported

    ct_ok = ct_supported(nfft) and nfft == 2 * n
    fused_ok = ct_fused_supported(n, nfft)
    if backend is None:
        from voxtpu.backend import default_backend

        if default_backend() == "pallas" and fused_ok:
            backend = "ct_fused"
        elif default_backend() == "pallas" and ct_ok:
            backend = "ct"
        else:
            backend = "fft"
    elif backend not in _BACKENDS:
        # Exact-match only: a prefix test would silently run the wrong
        # variant for a typo like "ct_fused_fast" in an A/B harness.
        raise ValueError(f"unknown backend {backend!r}; one of {sorted(_BACKENDS)}")
    elif backend.startswith("ct_fused") and not fused_ok:
        backend = "ct" if ct_ok else "fft"
    elif backend == "ct" and not ct_ok:
        backend = "fft"  # half-power even-bin identity needs nfft == 2n

    if backend.startswith("ct_fused"):
        # One Pallas kernel, every stage intermediate VMEM-resident
        # (voxtpu/ops/ct_fused_pallas.py) — same decomposition as "ct" without
        # the per-pass HBM round-trips. "ct_fused_x3" runs the 3-pass bf16
        # matmul algorithm (A/B harness: scripts/perf_ct_x3.py).
        from voxtpu.ops.ct_fused_pallas import ct_fused_power_ac

        shape = x.shape
        xb = x.reshape(-1, n)
        half, ac = ct_fused_power_ac(
            xb, nfft, interpret=backend.endswith("interpret"),
            algorithm="x3" if "x3" in backend else "x6",
        )
        half = half.reshape(shape[:-1] + (n // 2 + 1,))
        ac = ac[:, :n_coeffs].reshape(shape[:-1] + (n_coeffs,))
    elif backend == "ct":
        from voxtpu.ops.ct_fft import ct_autocorr, ct_half_power, ct_power

        shape = x.shape
        xb = x.reshape(-1, n)
        p_perm = ct_power(xb, nfft)
        half = ct_half_power(p_perm, n // 2 + 1).reshape(shape[:-1] + (n // 2 + 1,))
        ac = ct_autocorr(p_perm, n_coeffs).reshape(shape[:-1] + (n_coeffs,))
    else:
        spec = jnp.fft.rfft(x, n=nfft, axis=-1)
        power = (spec.real**2 + spec.imag**2).astype(x.dtype)
        if nfft == 2 * n:
            half = power[..., ::2]
        else:
            # Cold path (no in-repo caller has non-power-of-two frames): a
            # second, n-point transform for the half spectrum. Cast like the
            # fast branch so both return x.dtype (ADVICE r2).
            half = (jnp.abs(jnp.fft.rfft(x, n=n, axis=-1)) ** 2).astype(x.dtype)
        ac = jnp.fft.irfft(power, n=nfft, axis=-1)[..., :n_coeffs].astype(x.dtype)
    if quirk:
        x0 = x[..., :1]
        ac = ac - x0 * x[..., :n_coeffs] + x0
    return half, ac


def autocorrelate(
    x: jax.Array, n_coeffs: int | None = None, quirk: bool = True,
    backend: str | None = None,
) -> jax.Array:
    """Autocorrelation along the last axis.

    Args:
      x: (..., n) samples.
      n_coeffs: number of lags to return (default n). Must be <= n, as in the
        reference where longer requests would underflow (periodic.rs:281).
      quirk: reproduce the reference seed-term quirk exactly (default). With
        False, returns the textbook linear autocorrelation.
      backend: "fft" (XLA, CPU default) / "ct" (MXU matmul decomposition, TPU
        default where the shape supports it) / None = auto.

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

    from voxtpu.ops.ct_fft import ct_supported
    from voxtpu.ops.ct_fused_pallas import ct_fused_supported

    fused_ok = ct_fused_supported(n, nfft)
    if backend is None:
        from voxtpu.backend import default_backend

        if default_backend() == "pallas" and fused_ok:
            backend = "ct_fused"
        elif default_backend() == "pallas" and ct_supported(nfft):
            backend = "ct"
        else:
            backend = "fft"
    elif backend not in _BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; one of {sorted(_BACKENDS)}")
    elif backend.startswith("ct_fused") and not fused_ok:
        backend = "ct" if ct_supported(nfft) else "fft"
    elif backend == "ct" and not ct_supported(nfft):
        backend = "fft"

    if backend.startswith("ct_fused"):
        from voxtpu.ops.ct_fused_pallas import ct_fused_power_ac

        shape = x.shape
        xb = x.reshape(-1, n)
        _half, ac = ct_fused_power_ac(
            xb, nfft, interpret=backend.endswith("interpret"),
            algorithm="x3" if "x3" in backend else "x6",
        )
        ac = ac[:, :n_coeffs].reshape(shape[:-1] + (n_coeffs,))
    elif backend == "ct":
        from voxtpu.ops.ct_fft import ct_autocorr, ct_power

        shape = x.shape
        xb = x.reshape(-1, n)
        ac = ct_autocorr(ct_power(xb, nfft), n_coeffs).reshape(
            shape[:-1] + (n_coeffs,)
        )
    else:
        spec = jnp.fft.rfft(x, n=nfft, axis=-1)
        power = spec * jnp.conj(spec)
        ac = jnp.fft.irfft(power, n=nfft, axis=-1)[..., :n_coeffs]
        ac = ac.astype(x.dtype)

    if quirk:
        x0 = x[..., :1]
        ac = ac - x0 * x[..., :n_coeffs] + x0
    return ac
