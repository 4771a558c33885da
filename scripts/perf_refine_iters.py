"""Refine-kernel straggler probe: time vs the Brent iteration cap.

ROADMAP asks whether stragglers dominate the early-exit while_loop: if
time(cap=60) ~= time(cap=15), most 8-lane blocks exit early and further
per-iteration savings (two-probe variants etc.) can't buy much; if time
keeps falling as the cap drops, late-converging blocks dominate and
straggler-oriented work (finer block sorting, lane compaction) is the lever.

Run on the real chip: python scripts/perf_refine_iters.py [reps]
"""

import math
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.autocorr import autocorrelate
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann, hanning_lag
    from voxtpu.sinc import _max_effective_depth
    from voxtpu.ops.refine_pallas import brent_refine_pallas

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop, sr = 4096, 1024, 44100.0
    fmin, fmax, C = 60.0, 600.0, 32
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    frames = jax.device_put(frames * jnp.asarray(hann(n), dtype=jnp.float32))
    print(f"frames={frames.shape[0]}", flush=True)

    bi = n // 2
    offset = -bi - 1
    nx = bi - offset

    def candidates(fr):
        sl = autocorrelate(fr, n)
        sl = sl / jnp.max(jnp.abs(sl), axis=-1, keepdims=True)
        sl = sl / jnp.asarray(hanning_lag(n), dtype=fr.dtype)
        sl = jnp.concatenate([sl, jnp.zeros_like(sl)], axis=-1)
        seg = sl[:, :bi]
        is_max = (seg[:, :-2] < seg[:, 1:-1]) & (seg[:, 2:] < seg[:, 1:-1])
        ix = jnp.arange(1, bi - 1)
        peak, rev, fwd = seg[:, 1:-1], seg[:, :-2], seg[:, 2:]
        dr = 0.5 * (fwd - rev)
        d2r = 2.0 * peak - (rev - fwd)
        freq = sr / (ix.astype(fr.dtype)[None, :] + dr / d2r)
        cand = is_max & ((freq == 0.0) | ((freq > fmin) & (freq < fmax)))
        keys = jnp.where(cand, -jnp.arange(1, bi - 1, dtype=fr.dtype)[None, :], -jnp.inf)
        _v, order = jax.lax.top_k(keys, C)
        cand_c = jnp.take_along_axis(cand, order, axis=-1)
        freq_c = jnp.take_along_axis(freq, order, axis=-1)
        return sl, freq_c, cand_c

    max_x = sr / fmin - offset
    t1200 = _max_effective_depth(offset, nx, 1200, max_x + 1.0) + 1
    mb = offset + int(math.floor(max_x)) + 4

    sl, freq_c, cand_c = jax.jit(candidates)(frames)
    # non-integer dead-lane fill, matching pitch.py (integer fills trip the
    # kernel's snap branch)
    pos = jnp.where(cand_c, sr / freq_c - offset, float(bi) + 0.5)
    sl, pos, cand_c = jax.device_put((sl, pos, cand_c))

    results = {}
    for cap in (60, 40, 30, 20, 15, 10, 5):
        fn = jax.jit(
            lambda s, p, v, c=cap: jnp.stack(
                [jnp.sum(a) for a in brent_refine_pallas(
                    s, p, v, offset, 1200, t1200 - 1, max_base=mb, iters=c
                )]
            )
        )
        out = fn(sl, pos, cand_c)
        np.asarray(out)  # warm
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(sl, pos, cand_c)).sum()
            best = min(best, time.perf_counter() - t0)
        x, _f = brent_refine_pallas(sl, pos, cand_c, offset, 1200, t1200 - 1,
                                    max_base=mb, iters=cap)
        results[cap] = np.asarray(x)
        conv = (
            np.abs(results[cap] - results[60]).max() if 60 in results and cap != 60
            else 0.0
        )
        print(f"iters<={cap:3d}: {best*1e3:7.2f} ms   max|x - x60|={conv:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
