"""Signal framing: the batching axis of the whole framework.

The reference leaves framing to the caller's serial `Windower` loop
(``/root/reference/tests/lib.rs:71-83``); voxtpu makes the frame axis a
first-class batch dimension: one strided gather produces an (F, n) tensor that
every downstream kernel consumes in parallel. Frames are full windows at
offsets 0, hop, 2*hop, ... (partial tails dropped) with optional rectangular
or Hann weighting, matching `Windower::rectangle` / `Windower::hanning` usage
in the reference drivers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from voxtpu.windows import hann

__all__ = ["num_frames", "frame_signal"]


def num_frames(n: int, frame_len: int, hop: int) -> int:
    if n < frame_len:
        return 0
    return (n - frame_len) // hop + 1


def frame_signal(
    x: jax.Array | np.ndarray,
    frame_len: int,
    hop: int,
    window: str = "rectangle",
) -> jax.Array:
    """Extract (F, frame_len) frames from a 1-D signal.

    window: "rectangle" (no weighting) or "hanning" (periodic Hann, phase
    i/frame_len, the convention of lib.rs:66-70).

    TPU note: built from strided SLICES, not a gather — advanced-indexing
    gathers serialize on the TPU scalar unit (measured: seconds for a
    30-minute recording vs milliseconds for the slice form). With
    g = gcd(frame_len, hop), view the signal as rows of g samples; frame i
    spans frame_len/g consecutive rows starting at row i*(hop/g), so part j
    of every frame is one strided slice of the row matrix and a concat
    reassembles (F, frame_len). Bit-exact reindexing either way.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    f = num_frames(n, frame_len, hop)
    if f <= 0:
        raise ValueError(f"signal too short: {n} samples < frame {frame_len}")

    import math as _math

    g = _math.gcd(frame_len, hop)
    parts = frame_len // g
    if parts <= 64:
        s = hop // g  # row stride between consecutive frames
        need_rows = (f - 1) * s + parts
        rows = x[..., : need_rows * g].reshape(x.shape[:-1] + (need_rows, g))
        cols = [
            jax.lax.slice_in_dim(rows, j, j + (f - 1) * s + 1, stride=s, axis=-2)
            for j in range(parts)
        ]
        frames = jnp.concatenate(cols, axis=-1)
    else:
        # pathological hop/frame ratios (tiny gcd): fall back to the gather
        starts = jnp.arange(f) * hop
        idx = starts[:, None] + jnp.arange(frame_len)[None, :]
        frames = x[..., idx]
    if window == "hanning":
        frames = frames * jnp.asarray(hann(frame_len), dtype=frames.dtype)
    elif window != "rectangle":
        raise ValueError(f"unknown window: {window}")
    return frames
