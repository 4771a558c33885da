"""Shared test helpers."""

import numpy as np


def sine(n: int) -> np.ndarray:
    """One cycle of a sine over n samples: sin(2*pi*i/n).

    Mirrors the reference test helper `sine(len)` which builds
    `signal::rate(len).const_hz(1.0).sine()` (periodic.rs:470-473).
    """
    return np.sin(2.0 * np.pi * np.arange(n, dtype=np.float64) / n)


def sine_hz(freq: float, sample_rate: float, n: int) -> np.ndarray:
    """sin(2*pi*freq*i/sample_rate), the `rate(sr).const_hz(f).sine()` signal."""
    return np.sin(2.0 * np.pi * freq * np.arange(n, dtype=np.float64) / sample_rate)


def synth_vowel(
    sample_rate: float,
    f0: float,
    formants,  # [(freq_hz, bw_hz), ...]
    n: int,
    noise: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Source-filter synthetic vowel with known ground-truth formants.

    Glottal source = exponentially-decaying impulse train at f0 plus white
    noise, filtered through a cascade of 2nd-order resonators (one biquad per
    formant: poles at r*exp(+-j*2*pi*f/sr), r = exp(-pi*bw/sr)). Output is
    peak-normalized to 0.5.
    """
    rng = np.random.default_rng(seed)
    x = np.zeros(n, dtype=np.float64)
    period = sample_rate / f0
    k = np.arange(int(n / period) + 1)
    idx = np.round(k * period).astype(int)
    idx = idx[idx < n]
    x[idx] = 1.0
    # soften the pulses slightly (one-pole lowpass) so LPC isn't degenerate
    a = 0.98
    for i in range(1, n):
        x[i] += a * x[i - 1]
    x = np.diff(x, prepend=0.0)  # remove the DC ramp, keep the pulse shape
    if noise:
        x = x + noise * rng.standard_normal(n)

    for f, bw in formants:
        r = np.exp(-np.pi * bw / sample_rate)
        c = 2.0 * r * np.cos(2.0 * np.pi * f / sample_rate)
        r2 = r * r
        y = np.zeros_like(x)
        y1 = y2 = 0.0
        for i in range(n):
            y0 = x[i] + c * y1 - r2 * y2
            y[i] = y0
            y2, y1 = y1, y0
        x = y
    return 0.5 * x / np.max(np.abs(x))
