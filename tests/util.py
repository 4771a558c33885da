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
