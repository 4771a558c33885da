"""Micro-benchmarks mirroring the reference's bench files.

- bench_pitch  (benches/periodic.rs:15-25): Boersma pitch on 4096-sample
  Hann-windowed 44.1 kHz frames; the reference records 13,197,760 ns/frame.
- bench_laguerre (benches/polynomial.rs): one Laguerre root of a degree-3
  complex polynomial from (-64,-64); reference: 3,901 ns.

Batched equivalents: per-frame / per-poly amortized time at batch sizes that
fill the chip. Run: `python scripts/microbench.py [batch]`.
"""

import sys
import time

import numpy as np


def fetch_time(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(__import__("jax").tree.flatten(out)[0][0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(np.asarray(__import__("jax").tree.flatten(out)[0][0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.cplx import C
    from voxtpu.pitch import pitch_frames
    from voxtpu.roots import laguerre
    from voxtpu.windows import hann

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    # bench_pitch
    n = 4096
    t = np.arange(n) / 44100.0
    rng = np.random.default_rng(0)
    frames = (
        np.sin(2 * np.pi * 150.0 * t)[None, :] + 0.05 * rng.standard_normal((B, n))
    ).astype(np.float32) * np.asarray(hann(n), dtype=np.float32)
    fx = jax.device_put(jnp.asarray(frames))

    fn = jax.jit(
        lambda f: pitch_frames(f, 44100.0, threshold=0.2, fmin=60.0, fmax=600.0)
    )
    tt = fetch_time(fn, fx)
    print(
        f"bench_pitch:    B={B}  {tt*1e9/B:12.0f} ns/frame   "
        f"(reference: 13,197,760 ns; speedup {13197760/(tt*1e9/B):.0f}x)",
        flush=True,
    )

    # bench_laguerre
    poly = np.asarray([1.0, 2.5, 2.0, 3.0], dtype=np.float32)
    pre = jnp.asarray(np.tile(poly, (B * 64, 1)))
    pim = jnp.zeros_like(pre)
    start = C(jnp.asarray(np.float32(-64.0)), jnp.asarray(np.float32(-64.0)))
    lf = jax.jit(lambda re, im: laguerre(C(re, im), start))
    tt = fetch_time(lf, pre, pim)
    per = tt * 1e9 / (B * 64)
    print(
        f"bench_laguerre: B={B*64}  {per:12.1f} ns/root    "
        f"(reference: 3,901 ns; speedup {3901/per:.0f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
