"""Cumulative sub-stage timing of pitch_frames internals on the real chip."""

import math
import sys
import time

import numpy as np


def timeit(fn, x, iters=3):
    import jax

    out = fn(x)
    np.asarray(jax.tree.flatten(out)[0][0])
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        np.asarray(jax.tree.flatten(out)[0][0]).ravel()[:4].sum()
        best = min(best, time.perf_counter() - t0)
    return best


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
    audio = frames.shape[0] * hop / sr
    print(f"frames={frames.shape[0]} audio={audio:.1f}s", flush=True)

    bi = n // 2
    offset = -bi - 1
    nx = bi - offset
    dt = jnp.float32

    def s1(fr):  # AC + normalize + lag window + pad (CT backend, as the
        # full-pipeline shared-transform path uses on TPU)
        from voxtpu.autocorr import power_and_autocorrelate

        _, sl = power_and_autocorrelate(fr, n)
        sl = sl / jnp.max(jnp.abs(sl), axis=-1, keepdims=True)
        sl = sl / jnp.asarray(hanning_lag(n), dtype=fr.dtype)
        return jnp.concatenate([sl, jnp.zeros_like(sl)], axis=-1)

    def s2(fr):  # + maxima + parabolic + band filter
        sl = s1(fr)
        seg = sl[:, :bi]
        is_max = (seg[:, :-2] < seg[:, 1:-1]) & (seg[:, 2:] < seg[:, 1:-1])
        ix = jnp.arange(1, bi - 1)
        peak, rev, fwd = seg[:, 1:-1], seg[:, :-2], seg[:, 2:]
        dr = 0.5 * (fwd - rev)
        d2r = 2.0 * peak - (rev - fwd)
        freq = sr / (ix.astype(fr.dtype)[None, :] + dr / d2r)
        cand = is_max & ((freq == 0.0) | ((freq > fmin) & (freq < fmax)))
        return sl, freq, cand

    def s3(fr):  # + windowed rank-compaction (the production path, pitch.py)
        sl, freq, cand = s2(fr)
        ix = jnp.arange(1, bi - 1, dtype=jnp.int32)
        lag_lo = max(int(math.floor(sr / fmax)) - 64, 1)
        lag_hi = min(int(math.ceil(sr / fmin)) + 64, bi - 2)
        w0, w1 = lag_lo - 1, lag_hi
        candw = cand[:, w0:w1]
        rank = jnp.cumsum(candw.astype(jnp.int32), axis=-1)
        colw = jnp.arange(w0, w1, dtype=jnp.int32)[None, :]
        sel = candw & (rank <= C)
        order = jnp.stack(
            [jnp.sum(jnp.where(sel & (rank == c + 1), colw, 0), axis=-1)
             for c in range(C)], axis=-1)
        nvalid = jnp.minimum(rank[:, -1], C)
        cand_c = jnp.arange(C, dtype=jnp.int32)[None, :] < nvalid[:, None]
        freq_c = jnp.take_along_axis(freq, order, axis=-1)
        return sl, freq_c, cand_c

    max_x = sr / fmin - offset
    t30 = _max_effective_depth(offset, nx, 30, max_x) + 1
    t1200 = _max_effective_depth(offset, nx, 1200, max_x + 1.0) + 1
    mb = offset + int(math.floor(max_x)) + 3

    def s4(fr):  # + strength kernel (eval only)
        sl, freq_c, cand_c = s3(fr)
        pos = jnp.where(cand_c, sr / freq_c - offset, float(bi))
        _, strn = brent_refine_pallas(sl, pos, cand_c, offset, 30, t30 - 1,
                                      max_base=mb, iters=0)
        return strn

    def s5(fr):  # + full Brent refine kernel (THE production path since r3:
        # the depth-30 strength eval is dead, PERFORMANCE.md 10b)
        sl, freq_c, cand_c = s3(fr)
        pos = jnp.where(cand_c, sr / freq_c - offset, float(bi))
        x, fx = brent_refine_pallas(sl, pos, cand_c, offset, 1200, t1200 - 1,
                                    max_base=mb + 1)
        return x, fx

    def s6(fr):  # + fused strength+refine (pre-r3 production path; kept as a
        # measurement of what the dead strength eval cost — the production
        # path is s5 since the r3 removal, PERFORMANCE.md 10b)
        sl, freq_c, cand_c = s3(fr)
        pos = jnp.where(cand_c, sr / freq_c - offset, float(bi))
        x, fx, strn = brent_refine_pallas(
            sl, pos, cand_c, offset, 1200, t1200 - 1, max_base=mb + 1,
            strength_depth=30,
        )
        return x, fx, strn

    threshold = 0.2

    def post_argsort(fr):  # s5 + the shipped ending: pos/edge selects,
        # unvoiced append, stable argsort + 3 take_along_axis gathers.
        sl, freq_c, cand_c = s3(fr)
        pos = jnp.where(cand_c, sr / freq_c - offset, float(bi) + 0.5)
        xb, fb = brent_refine_pallas(sl, pos, cand_c, offset, 1200, t1200 - 1,
                                     max_base=mb + 1)
        y_last = sl[:, nx - 1][:, None]
        at_zero = pos == 0.0
        past_end = pos >= nx
        xmid = jnp.where(at_zero, 0.0, jnp.where(past_end, float(nx), xb))
        ymid = jnp.where(at_zero, sl[:, 0][:, None], jnp.where(past_end, y_last, fb))
        xmid = xmid + offset
        ymid = jnp.where(ymid > 1.0, 1.0 / ymid, ymid)
        freq_r = sr / xmid
        B = fr.shape[0]
        dtt = fr.dtype
        freq_all = jnp.concatenate(
            [jnp.where(cand_c, freq_r, 0.0), jnp.zeros((B, 1), dtype=dtt)], axis=-1)
        strength_all = jnp.concatenate(
            [jnp.where(cand_c, ymid, -jnp.inf), jnp.full((B, 1), threshold, dtype=dtt)],
            axis=-1)
        valid_all = jnp.concatenate([cand_c, jnp.ones((B, 1), dtype=bool)], axis=-1)
        sort_ix = jnp.argsort(-strength_all, axis=-1, stable=True)
        freq_s = jnp.take_along_axis(freq_all, sort_ix, axis=-1)
        strength_s = jnp.take_along_axis(strength_all, sort_ix, axis=-1)
        valid_s = jnp.take_along_axis(valid_all, sort_ix, axis=-1)
        strength_s = jnp.where(valid_s, strength_s, 0.0)
        return freq_s, strength_s, valid_s

    def post_laxsort(fr):  # same ending but ONE variadic stable lax.sort
        # carrying (freq, strength, valid) as payloads — zero gathers.
        sl, freq_c, cand_c = s3(fr)
        pos = jnp.where(cand_c, sr / freq_c - offset, float(bi) + 0.5)
        xb, fb = brent_refine_pallas(sl, pos, cand_c, offset, 1200, t1200 - 1,
                                     max_base=mb + 1)
        y_last = sl[:, nx - 1][:, None]
        at_zero = pos == 0.0
        past_end = pos >= nx
        xmid = jnp.where(at_zero, 0.0, jnp.where(past_end, float(nx), xb))
        ymid = jnp.where(at_zero, sl[:, 0][:, None], jnp.where(past_end, y_last, fb))
        xmid = xmid + offset
        ymid = jnp.where(ymid > 1.0, 1.0 / ymid, ymid)
        freq_r = sr / xmid
        B = fr.shape[0]
        dtt = fr.dtype
        freq_all = jnp.concatenate(
            [jnp.where(cand_c, freq_r, 0.0), jnp.zeros((B, 1), dtype=dtt)], axis=-1)
        strength_all = jnp.concatenate(
            [jnp.where(cand_c, ymid, -jnp.inf), jnp.full((B, 1), threshold, dtype=dtt)],
            axis=-1)
        valid_all = jnp.concatenate([cand_c, jnp.ones((B, 1), dtype=bool)], axis=-1)
        _key, freq_s, strength_s, valid_s = jax.lax.sort(
            (-strength_all, freq_all, strength_all, valid_all),
            dimension=-1, is_stable=True, num_keys=1)
        strength_s = jnp.where(valid_s, strength_s, 0.0)
        return freq_s, strength_s, valid_s

    def s3_nogather(fr):  # s3 with freq compacted by the same masked reduces
        # instead of take_along_axis.
        sl, freq, cand = s2(fr)
        lag_lo = max(int(math.floor(sr / fmax)) - 64, 1)
        lag_hi = min(int(math.ceil(sr / fmin)) + 64, bi - 2)
        w0, w1 = lag_lo - 1, lag_hi
        candw = cand[:, w0:w1]
        freqw = freq[:, w0:w1]
        rank = jnp.cumsum(candw.astype(jnp.int32), axis=-1)
        sel = candw & (rank <= C)
        freq_c = jnp.stack(
            [jnp.sum(jnp.where(sel & (rank == c + 1), freqw, 0.0), axis=-1)
             for c in range(C)], axis=-1)
        nvalid = jnp.minimum(rank[:, -1], C)
        cand_c = jnp.arange(C, dtype=jnp.int32)[None, :] < nvalid[:, None]
        return sl, freq_c, cand_c

    def s2_kernel(fr):  # s1+s2 as the fused pitch-pre Pallas kernel
        # (ops/pitch_pre_pallas.py, VERDICT r3 #9) — the r4 production path.
        from voxtpu.autocorr import power_and_autocorrelate
        from voxtpu.ops.pitch_pre_pallas import pitch_pre_pallas

        _, ac = power_and_autocorrelate(fr, n)
        sl, freq, cand = pitch_pre_pallas(
            ac, hanning_lag(n), n, bi, sr, fmin, fmax
        )
        return sl, freq[:, 1 : bi - 1], cand[:, 1 : bi - 1]

    def s3_kernel(fr):  # kernel pre-stage + the production rank compaction
        sl, freq, cand = s2_kernel(fr)
        lag_lo = max(int(math.floor(sr / fmax)) - 64, 1)
        lag_hi = min(int(math.ceil(sr / fmin)) + 64, bi - 2)
        w0, w1 = lag_lo - 1, lag_hi
        candw = cand[:, w0:w1]
        freqw = freq[:, w0:w1]
        rank = jnp.cumsum(candw.astype(jnp.int32), axis=-1)
        sel = candw & (rank <= C)
        freq_c = jnp.stack(
            [jnp.sum(jnp.where(sel & (rank == c + 1), freqw, 0.0), axis=-1)
             for c in range(C)], axis=-1)
        nvalid = jnp.minimum(rank[:, -1], C)
        cand_c = jnp.arange(C, dtype=jnp.int32)[None, :] < nvalid[:, None]
        return sl, freq_c, cand_c

    def scalar(fn):
        def g(fr):
            out = fn(fr)
            leaves = jax.tree.flatten(out)[0]
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return g

    for name, fn in [("s1 ac", s1), ("s2 maxima", s2), ("s2 kernel", s2_kernel),
                     ("s3 compact", s3),
                     ("s3 nogather", s3_nogather), ("s3 kernel", s3_kernel),
                     ("s4 strength", s4), ("s5 refine", s5),
                     ("s6 fused s+r", s6),
                     ("s7 argsort", post_argsort), ("s7 laxsort", post_laxsort)]:
        t = timeit(jax.jit(scalar(fn)), frames)
        print(f"{name:12s}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
