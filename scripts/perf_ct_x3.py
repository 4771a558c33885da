"""A/B the 3-pass bf16 matmul algorithm (BF16_BF16_F32_X3) on the fused CT
chain (VERDICT r3 #1 — the last untried perf pool).

The fused kernel's f32 matmuls run at HIGHEST precision = 6 bf16 MXU passes;
the X3 algorithm (hi/lo bf16 split, 3 cross terms, lo*lo dropped) halves the
MXU work at ~f32 accuracy. Mosaic's dot_general only takes a Precision, so
the kernel hand-rolls the split (ops/ct_fused_pallas.py algorithm="x3").

Measures, on the real chip at the production shape:
  - wall time per variant (fused checksum, best-of-9)
  - max relative error of BOTH outputs (half power + AC) vs a float64 host
    FFT oracle — the error-vs-f64 bar the 2e-7 HIGHEST baseline sets

Run: python scripts/perf_ct_x3.py [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from voxtpu.autocorr import power_and_autocorrelate
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop = 4096, 1024
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames_np = np.lib.stride_tricks.sliding_window_view(sig, n)[::hop]
    frames_np = frames_np * np.asarray(hann(n), dtype=np.float32)
    frames = jax.device_put(jnp.asarray(frames_np, dtype=jnp.float32))
    print(f"frames={frames.shape[0]} n={n}", flush=True)

    # float64 host oracle (quirk=False: the quirk correction is algorithm-
    # independent XLA epilogue, not part of the A/B).
    x64 = frames_np.astype(np.float64)
    spec = np.fft.rfft(x64, n=2 * n, axis=-1)
    p64 = (spec.real**2 + spec.imag**2)
    half64 = p64[:, ::2][:, : n // 2 + 1]
    ac64 = np.fft.irfft(p64, n=2 * n, axis=-1)[:, :n]

    for backend in ("ct_fused", "ct_fused_x3"):
        fn = jax.jit(
            lambda x, b=backend: jnp.stack(
                [
                    jnp.sum(jnp.abs(a))
                    for a in power_and_autocorrelate(x, backend=b, quirk=False)
                ]
            )
        )
        np.asarray(fn(frames))  # compile + warm
        best = 1e9
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(fn(frames)).sum()
            best = min(best, time.perf_counter() - t0)
        half, ac = power_and_autocorrelate(frames, backend=backend, quirk=False)
        half, ac = np.asarray(half, np.float64), np.asarray(ac, np.float64)
        dh = np.abs(half - half64).max() / np.abs(half64).max()
        da = np.abs(ac - ac64).max() / np.abs(ac64).max()
        print(
            f"{backend:12s}: {best * 1e3:7.2f} ms   "
            f"vs f64: half rel {dh:.2e}  ac rel {da:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
