"""MFCC: mel filterbank energies + DCT, fused as two matmuls around one rFFT.

Reference: ``/root/reference/src/spectrum.rs:371-441``. The reference computes
a full complex FFT per frame, then loops bins per triangular filter, then an
O(n^2) DCT. TPU design: the filterbank and DCT are small constant matrices
built on the host at trace time, so the whole MFCC is

    rFFT (batched) -> [power, magnitude] @ filterbank -> log10 -> @ DCT

two MXU matmuls and one elementwise pass over the entire corpus batch.

Reference quirks reproduced in quirk mode (the default, `exact=True`):
- the *rising* filter slope weights **power** (`norm_sqr`) but the *falling*
  slope weights **magnitude** (`norm`) (spectrum.rs:424-433);
- both slopes use the ascending weight i/width — the falling slope is NOT
  mirrored (spectrum.rs:425, 431);
- the log is clamped as `max(log10(e), 1e-10)` — i.e. any filter energy below
  ~1.0 clamps to 1e-10, and log10(0) = -inf also clamps to 1e-10
  (spectrum.rs:434);
- mel scale is the 1125/700 natural-log variant (spectrum.rs:375-381);
- bin mapping is `floor((len+1) * hz / sr)` (spectrum.rs:414);
- the DCT is the unnormalized DCT-II with factor 2 (spectrum.rs:391-398).

`exact=False` gives a corrected textbook filterbank (power on both slopes,
mirrored falling slope, plain log floor) for users who want standard MFCCs.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["hz_to_mel", "mel_to_hz", "dct", "dct_matrix", "mel_banks", "mfcc"]


def hz_to_mel(hz):
    """1125 * ln(1 + hz/700) (spectrum.rs:375-377)."""
    return 1125.0 * np.log1p(np.asarray(hz) / 700.0)


def mel_to_hz(mel):
    """700 * (exp(mel/1125) - 1) (spectrum.rs:379-381)."""
    return 700.0 * (np.exp(np.asarray(mel) / 1125.0) - 1.0)


@functools.lru_cache(maxsize=32)
def dct_matrix(n: int) -> np.ndarray:
    """Unnormalized DCT-II matrix: out[k] = 2 * sum_n s[n] cos(pi k (2n+1) / 2N).

    spectrum.rs:391-398; applied as one matmul (n <= ~26 in practice).
    """
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return 2.0 * np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n))


def dct(x: jax.Array) -> jax.Array:
    """DCT-II along the last axis (matmul form).

    HIGHEST precision: true-f32 results on TPU (the default 1-pass bf16
    matmul costs ~1e-2 absolute in the cepstra), and the result is then
    independent of the batch shape (XLA's bf16 pass structure is not)."""
    x = jnp.asarray(x)
    mat = jnp.asarray(dct_matrix(x.shape[-1]), dtype=x.dtype)
    return jnp.matmul(x, mat.T, precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=32)
def mel_banks(
    frame_len: int,
    num_coeffs: int,
    freq_lo: float,
    freq_hi: float,
    sample_rate: float,
    exact: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Triangular filterbank weight matrices over FFT bins.

    Returns (w_power, w_magnitude), each (num_coeffs, frame_len): the energy of
    filter f is `power_spectrum @ w_power[f] + magnitude_spectrum @ w_mag[f]`.

    Bin layout per spectrum.rs:411-414: num_coeffs+2 mel-spaced points mapped
    to bins via floor((len+1) * hz / sr). In exact mode the rising slope feeds
    w_power and the falling slope w_magnitude, both with ascending i/width
    weights; in corrected mode both slopes feed w_power with a proper
    triangle.
    """
    mel_lo = float(hz_to_mel(freq_lo))
    mel_hi = float(hz_to_mel(freq_hi))
    mel_range = mel_hi - mel_lo
    points = [
        (i / num_coeffs) * mel_range + mel_lo for i in range(num_coeffs + 2)
    ]
    bins = [int(math.floor((frame_len + 1) * float(mel_to_hz(p)) / sample_rate)) for p in points]

    w_pow = np.zeros((num_coeffs, frame_len))
    w_mag = np.zeros((num_coeffs, frame_len))
    for f in range(num_coeffs):
        b0, b1, b2 = bins[f], bins[f + 1], bins[f + 2]
        up = b1 - b0
        for i, b in enumerate(range(b0, b1)):
            if b < frame_len:
                w_pow[f, b] += i / up
        down = b2 - b1
        for i, b in enumerate(range(b1, b2)):
            if b >= frame_len:
                continue
            if exact:
                w_mag[f, b] += i / down
            else:
                w_pow[f, b] += 1.0 - (i / down)
    return w_pow, w_mag


def mfcc(
    x: jax.Array,
    num_coeffs: int,
    freq_bounds: tuple[float, float],
    sample_rate: float,
    exact: bool = True,
    half_power: jax.Array | None = None,
) -> jax.Array:
    """MFCC of (already windowed) frames, batched over leading axes.

    Reference: `[T]::mfcc` (spectrum.rs:410-440). Returns (..., num_coeffs).

    half_power: optional precomputed |rfft(x)|^2, (..., n//2+1) — lets the
    pipeline reuse the autocorrelation FFT (X_n[k] == X_2n[2k]).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    dt = x.dtype

    w_pow, w_mag = mel_banks(n, num_coeffs, float(freq_bounds[0]), float(freq_bounds[1]),
                             float(sample_rate), exact)

    # The reference's full complex FFT of a real signal is conjugate-symmetric
    # (bin k > n/2 equals bin n-k). Rather than mirroring the spectrum (a
    # gather), fold the mirror into the host-built filterbank weights:
    # w_half[k] = w[k] + w[n-k] for 0 < k < n/2.
    half = n // 2 + 1
    fold = np.zeros((n, half))
    for k in range(n):
        fold[k, k if k <= n // 2 else n - k] = 1.0
    wp = jnp.asarray((w_pow @ fold).T, dtype=dt)  # (half, num_coeffs)
    wm = jnp.asarray((w_mag @ fold).T, dtype=dt)

    if half_power is None:
        spec = jnp.fft.rfft(x, axis=-1)
        half_pow = (spec.real**2 + spec.imag**2).astype(dt)
    else:
        half_pow = half_power
    half_mag = jnp.sqrt(half_pow)
    # HIGHEST precision (see dct): f32-true filterbank energies, stable
    # across batch shapes.
    energies = jnp.matmul(
        half_pow, wp, precision=jax.lax.Precision.HIGHEST
    ) + jnp.matmul(half_mag, wm, precision=jax.lax.Precision.HIGHEST)

    if exact:
        # log10(e).max(1e-10): -inf (from e == 0) and all small energies clamp
        # to 1e-10 (spectrum.rs:434). NaN cannot occur for e >= 0.
        log_e = jnp.maximum(jnp.log10(jnp.maximum(energies, 0.0)), 1e-10)
    else:
        log_e = jnp.log10(jnp.maximum(energies, 1e-30))

    return dct(log_e)
