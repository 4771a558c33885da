"""Measure the fused Pallas CT kernel vs the XLA CT chain vs the XLA FFT.

VERDICT r2 #4: the XLA CT chain sits at ~12% of the HBM roofline (10.2 ms
moving ~1.0 GB where the irreducible traffic is ~0.25 GB); the fused kernel
(voxtpu/ops/ct_fused_pallas.py) keeps every stage intermediate VMEM-resident.
Times power_and_autocorrelate (the pitch+MFCC shared-transform production
entry) on the production shape. Run on the real chip:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_ct_fused.py [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.autocorr import power_and_autocorrelate
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop = 4096, 1024
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    frames = jax.device_put(frames * jnp.asarray(hann(n), dtype=jnp.float32))
    print(f"frames={frames.shape[0]} n={n}", flush=True)

    outs = {}
    for backend in ("fft", "ct", "ct_fused"):
        fn = jax.jit(
            lambda x, b=backend: jnp.stack(
                [jnp.sum(jnp.abs(a)) for a in power_and_autocorrelate(x, backend=b)]
            )
        )
        np.asarray(fn(frames))  # compile + warm
        best = 1e9
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(fn(frames)).sum()
            best = min(best, time.perf_counter() - t0)
        half, ac = power_and_autocorrelate(frames, backend=backend)
        outs[backend] = (np.asarray(half), np.asarray(ac))
        print(f"{backend:9s}: {best * 1e3:7.2f} ms", flush=True)

    for b in ("ct", "ct_fused"):
        dh = np.abs(outs[b][0] - outs["fft"][0]).max() / np.abs(outs["fft"][0]).max()
        da = np.abs(outs[b][1] - outs["fft"][1]).max() / np.abs(outs["fft"][1]).max()
        print(f"{b:9s} vs fft: half rel {dh:.2e}  ac rel {da:.2e}", flush=True)


if __name__ == "__main__":
    main()
