"""Native (C++) data-loading runtime, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; every
entry point has a pure-Python fallback (voxtpu.io_wav / voxtpu.frame), so the
framework works without a toolchain. See wavio.cpp for the role-parity note
vs the reference's native `hound` + `Windower` ingest path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wavio.cpp")
_SO = os.path.join(_HERE, "_wavio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Return the ctypes library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.voxtpu_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.voxtpu_wav_info.restype = ctypes.c_int
        lib.voxtpu_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint32,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_uint64,
        ]
        lib.voxtpu_wav_read.restype = ctypes.c_int
        for name in ("voxtpu_frame_f32", "voxtpu_frame_f64"):
            fn = getattr(lib, name)
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_void_p,
            ]
            fn.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def wav_info(path: str):
    """Header-only probe -> (sample_rate, bits, channels, frames_per_channel)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavio unavailable (g++ build failed)")
    sr = ctypes.c_uint32()
    bits = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    n = ctypes.c_uint64()
    rc = lib.voxtpu_wav_info(path.encode(), sr, bits, ch, n)
    if rc != 0:
        raise IOError(f"voxtpu_wav_info failed ({rc}) for {path}")
    return int(sr.value), int(bits.value), int(ch.value), int(n.value)


def read_wav(path: str, dtype=np.float64, channel: int = 0,
             return_channels: bool = False):
    """Native WAV read -> (samples, sample_rate, bits[, n_channels]).

    Raises RuntimeError if the native library is unavailable, IndexError for
    an out-of-range channel. One call does the whole job (header probe +
    decode) — callers should not pair it with a separate `wav_info` probe,
    which would re-read and re-parse the file (ADVICE r4)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavio unavailable (g++ build failed)")
    sr = ctypes.c_uint32()
    bits = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    n = ctypes.c_uint64()
    rc = lib.voxtpu_wav_info(path.encode(), sr, bits, ch, n)
    if rc != 0:
        raise IOError(f"voxtpu_wav_info failed ({rc}) for {path}")
    if channel < 0 or channel >= ch.value:
        # Checked host-side: a negative value would wrap through the C
        # uint32 parameter.
        raise IndexError(
            f"channel {channel} out of range: {path} has {ch.value} channel(s)"
        )
    f64 = np.dtype(dtype) == np.float64
    out = np.empty(n.value, dtype=np.float64 if f64 else np.float32)
    rc = lib.voxtpu_wav_read(
        path.encode(), channel, int(f64),
        out.ctypes.data_as(ctypes.c_void_p), out.shape[0],
    )
    if rc != 0:
        raise IOError(f"voxtpu_wav_read failed ({rc}) for {path}")
    if return_channels:
        return out, int(sr.value), int(bits.value), int(ch.value)
    return out, int(sr.value), int(bits.value)


def frame(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """Native strided framing -> (F, frame_len) contiguous batch."""
    lib = load()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    x = np.ascontiguousarray(x)
    if x.dtype == np.float64:
        fn = lib.voxtpu_frame_f64
    elif x.dtype == np.float32:
        fn = lib.voxtpu_frame_f32
    else:
        raise TypeError(x.dtype)
    n = x.shape[0]
    if n < frame_len:
        raise ValueError(f"signal too short: {n} < {frame_len}")
    F = (n - frame_len) // hop + 1
    out = np.empty((F, frame_len), dtype=x.dtype)
    fn(
        x.ctypes.data_as(ctypes.c_void_p),
        n,
        frame_len,
        hop,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
