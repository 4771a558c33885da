"""On-chip timing of the Viterbi pitch-path search (voxtpu/viterbi.py).

The `--viterbi` path adds a sequential DP over frames on top of the
frame-parallel pipeline; this script measures its standalone cost on real
speech candidates (fused-scalar-checksum fetch, best-of-9).

Findings (v5e, 5121 frames, C=33, wall incl. ~28 ms tunnel floor):
- baseline scan:                 ~43 ms  (~15 ms device)
- precomputed log2 freqs:        ~44 ms  (no change — not transcendental-bound)
- cost tensor batched outside:   ~43 ms  (no change — not compute-bound)
- unroll=8 on both scans:        ~36-40 ms (~8-12 ms device; KEPT — the DP is
  scan-step-overhead-bound; unrolling amortizes the per-step loop cost;
  unroll=32 measured no better than 8; per-step math unchanged, paths
  bit-identical)
- single Pallas kernel (DP + backtrace in one pallas_call,
  ops/viterbi_pallas.py): ~30 ms wall (~2 ms device) — ~4-5x the stage's
  device time off; KEPT as the TPU default (backend="pallas"); paths
  bit-identical to the jnp twin (checked below and in tests/test_pallas.py)

Run: python scripts/perf_viterbi.py [reps]
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
    from voxtpu.viterbi import PathConfig, pitch_path

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop, sr = 4096, 1024, 44100.0
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    w = jnp.asarray(hann(n), dtype=jnp.float32)
    freq, strength, valid = jax.jit(
        lambda f: pitch_frames(
            f * w, sr, threshold=0.2, fmin=60.0, fmax=600.0, max_candidates=32
        )
    )(frames)
    peaks = jnp.max(jnp.abs(frames), axis=-1)
    inten = peaks / jnp.maximum(jnp.max(peaks), 1e-30)
    freq, strength, valid, inten = jax.device_put((freq, strength, valid, inten))
    print(f"frames={frames.shape[0]} C={freq.shape[1]}", flush=True)

    cfg = PathConfig(ceiling=600.0)
    outs = {}
    for backend in ("jnp", "pallas"):
        fn = jax.jit(
            lambda f, s, v, i: jnp.stack(
                [
                    jnp.sum(a)
                    for a in pitch_path(
                        f, s, v, cfg, local_intensity=i, backend=backend
                    )
                ]
            )
        )
        outs[backend] = np.asarray(fn(freq, strength, valid, inten))
        best = 1e9
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(fn(freq, strength, valid, inten)).sum()
            best = min(best, time.perf_counter() - t0)
        print(
            f"viterbi pitch_path[{backend}]: {best * 1e3:.2f} ms wall "
            f"for {frames.shape[0]} frames",
            flush=True,
        )
    same = np.array_equal(outs["jnp"], outs["pallas"])
    print(f"checksums equal across backends: {same}", flush=True)


if __name__ == "__main__":
    main()
