"""A/B the refine-kernel op trims (VERDICT r2 #3) against a pinned baseline.

Loads a baseline copy of refine_pallas (pass its path as argv[1], e.g.
`git show <rev>:voxtpu/ops/refine_pallas.py > /tmp/refine_baseline.py`) next
to the current module and times both back-to-back in one process — same chip,
same session, best-of-N — on the production shape: the fused strength(depth
30) + Brent(depth 1200) pass over real-speech candidates, non-integer
dead-lane fill (pitch.py's production fill).

Run on the real chip:
  git show HEAD:voxtpu/ops/refine_pallas.py > /tmp/refine_baseline.py
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_refine_trims.py /tmp/refine_baseline.py
"""

import importlib.util
import math
import sys
import time

import numpy as np


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.autocorr import autocorrelate
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann, hanning_lag
    from voxtpu.sinc import _max_effective_depth
    from voxtpu.ops import refine_pallas as cur

    variant_paths = [a for a in sys.argv[1:] if not a.isdigit()]
    reps = int(sys.argv[-1]) if sys.argv[1:] and sys.argv[-1].isdigit() else 42

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
    # production fill (pitch.py): non-integer
    pos = jnp.where(cand_c, sr / freq_c - offset, float(bi) + 0.5)
    sl, pos, cand_c = jax.device_put((sl, pos, cand_c))

    variants = [("current", cur.brent_refine_pallas)]
    for i, path in enumerate(variant_paths):
        name = path.rsplit("/", 1)[-1].replace(".py", "").replace("refine_", "")
        mod = load_module(path, f"refine_variant_{i}")
        variants.append((name, mod.brent_refine_pallas))

    outs = {}
    for mode, strength in (("fused strength+refine", 30), ("refine-only", None)):
        for name, fn_mod in variants:
            fn = jax.jit(
                lambda s, p, v, m=fn_mod, sd=strength: jnp.stack(
                    [jnp.sum(a) for a in m(
                        s, p, v, offset, 1200, t1200 - 1, max_base=mb,
                        iters=60, strength_depth=sd,
                    )]
                )
            )
            np.asarray(fn(sl, pos, cand_c))  # compile + warm
            best = 1e9
            for _ in range(12):
                t0 = time.perf_counter()
                np.asarray(fn(sl, pos, cand_c)).sum()
                best = min(best, time.perf_counter() - t0)
            outs[(mode, name)] = np.asarray(fn(sl, pos, cand_c))
            print(f"{mode:22s} {name:12s}: {best * 1e3:7.2f} ms", flush=True)
        for name, _ in variants[1:]:
            d = np.abs(outs[(mode, "current")] - outs[(mode, name)]).max()
            print(f"{mode:22s} |current - {name}| checksum diff = {d:.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
