"""Speed/accuracy sweep of the refine pass's sinc depth cap.

The reference hardcodes Sinc(1200) for the Brent refinement
(periodic.rs:445), but its own low clip (periodic.rs:46-52) lowers the
effective depth to lag+1 — so every candidate's tap window spans the whole
buffer prefix [0, 2*lag+1], and the refine kernel's chunk walk (60% of
device time) is proportional to the deepest lag (~2*sr/fmin columns).
Praat itself ships capped-depth sinc (sinc70) as its fast path. This script
measures what a depth cap buys and costs on real speech: wall time of the
full pitch stage (the refine kernel is fused inside) and the user-visible
f0/strength error vs the depth-1200 parity semantics, through both
take_best and the Viterbi path.

Run: python scripts/perf_refine_depth.py [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann
    from voxtpu.pitch import pitch_frames
    from voxtpu.viterbi import PathConfig, pitch_path, take_best

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop, sr = 4096, 1024, 44100.0
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    w = jnp.asarray(hann(n), dtype=jnp.float32)
    fw = jax.device_put(frames * w)
    print(f"frames={frames.shape[0]}", flush=True)

    cfg = PathConfig(ceiling=600.0)
    results = {}
    for depth in (1200, 256, 128, 70, "parabolic"):
        kw = (
            {"refine": "parabolic"}
            if depth == "parabolic"
            else {"refine_depth": depth}
        )
        fn = jax.jit(
            lambda f: pitch_frames(
                f, sr, threshold=0.2, fmin=60.0, fmax=600.0,
                max_candidates=32, **kw,
            )
        )
        freq, strength, valid = fn(fw)
        # fused checksum fetch for timing
        tfn = jax.jit(
            lambda f: jnp.sum(
                jnp.stack([jnp.sum(a.astype(jnp.float32)) for a in pitch_frames(
                    f, sr, threshold=0.2, fmin=60.0, fmax=600.0,
                    max_candidates=32, **kw,
                )])
            )
        )
        np.asarray(tfn(fw))
        best = 1e9
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(tfn(fw))
            best = min(best, time.perf_counter() - t0)

        fb, sb = take_best(freq, strength)
        fv, sv = pitch_path(freq, strength, valid, cfg, backend="jnp")
        results[depth] = dict(
            t=best, fb=np.asarray(fb), sb=np.asarray(sb),
            fv=np.asarray(fv), sv=np.asarray(sv),
        )
        print(f"depth={depth}: pitch stage {best * 1e3:.2f} ms wall", flush=True)

    ref = results[1200]

    def relerr(a, b):
        m = (b != 0) & (a != 0)
        if not m.any():
            return 0.0, 0.0
        r = np.abs(a[m] - b[m]) / np.abs(b[m])
        return float(r.max()), float(np.median(r))

    def voicing_flips(a, b):
        return int(np.sum((a == 0) != (b == 0)))

    for depth in (256, 128, 70, "parabolic"):
        r = results[depth]
        mb, medb = relerr(r["fb"], ref["fb"])
        mv, medv = relerr(r["fv"], ref["fv"])
        print(
            f"depth={depth}: take_best f0 relerr max {mb:.2e} med {medb:.2e} "
            f"(voicing flips {voicing_flips(r['fb'], ref['fb'])}); "
            f"viterbi f0 relerr max {mv:.2e} med {medv:.2e} "
            f"(flips {voicing_flips(r['fv'], ref['fv'])}); "
            f"strength maxdiff {np.max(np.abs(r['sb'] - ref['sb'])):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
