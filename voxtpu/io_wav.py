"""WAV ingest with reference-exact bit-depth normalization.

The reference reads WAVs via `hound` and normalizes integer samples as
`s / (i32::MAX >> (32 - bits))` (``/root/reference/tests/lib.rs:17-19``), i.e.
/32767 for 16-bit audio. (The formant example's `<<` variant,
examples/formant_extraction/src/main.rs:43, overflow-shifts into a negative
divisor and is a reference bug; we implement the tests' `>>` convention.)

A C++ fast loader (voxtpu/native) accelerates corpus-scale ingest; this module
is the always-available pure-Python path using the stdlib `wave` parser.
"""

from __future__ import annotations

import wave
from dataclasses import dataclass

import numpy as np

__all__ = ["WavData", "read_wav"]

I32_MAX = 2**31 - 1


@dataclass
class WavData:
    samples: np.ndarray  # (n,) or (n, channels) float64 in [-1, 1]
    sample_rate: int
    bits_per_sample: int

    @property
    def duration(self) -> float:
        return self.samples.shape[0] / self.sample_rate


def read_wav(path: str, dtype=np.float64) -> WavData:
    """Read a PCM WAV file, normalized like the reference test driver."""
    with wave.open(str(path), "rb") as w:
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        sr = w.getframerate()
        raw = w.readframes(n)

    bits = sw * 8
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.int64)
    elif sw == 1:
        # 8-bit WAV is unsigned; recenter.
        data = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        data = (
            b[:, 0].astype(np.int64)
            | (b[:, 1].astype(np.int64) << 8)
            | (b[:, 2].astype(np.int64) << 16)
        )
        data = np.where(data >= 1 << 23, data - (1 << 24), data)
    else:
        raise ValueError(f"unsupported sample width: {sw}")

    scale = I32_MAX >> (32 - bits)
    samples = (data / scale).astype(dtype)
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return WavData(samples=samples, sample_rate=sr, bits_per_sample=bits)
