"""Measure the compensated-Newton root polish (VERDICT r4 #4).

The f32 fast path's formant accuracy sat at 2.6 Hz worst case at the bench
config (order-13 Laguerre at 44.1 kHz, PARITY.md) — outside the reference's
own <1 Hz golden tolerance (/root/reference/src/spectrum.rs:621-628). The
polish (`voxtpu.roots.polish_roots`) re-Newtons each f32 root against the
UNDEFLATED polynomial with double-f32 residual evaluation, recovering the
accuracy deflation drift loses. The reference never polishes
(polynomial.rs:34-72), so this beats it rather than matching it.

Two measurements:

  accuracy (CPU, default):  f32 formant_freqs/bws with polish {off,on} vs the
      f64 parity path on real 44.1 kHz speech at orders 13 and 12 — the
      PARITY.md budget rows. Also a plain-f32 (uncompensated) Newton A/B to
      show the double-f32 residual is what buys the accuracy.
  cost (--tpu):             full-pipeline wall time on the chip with polish
      {off,on} at the bench shape (fused checksum, best-of-9).

Run:  python scripts/perf_root_polish.py            # CPU accuracy
      python scripts/perf_root_polish.py --tpu      # chip cost
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _speech(sr_target=44100):
    from voxtpu.io_wav import read_wav

    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    assert int(wav.sample_rate) == sr_target
    return np.asarray(wav.samples), float(wav.sample_rate)


def accuracy():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import cpu_env  # noqa: F401  (CPU + x64 before any jax use)
    import dataclasses

    import jax.numpy as jnp

    from voxtpu.frame import frame_signal
    from voxtpu.pipeline import AnalysisConfig, FormantConfig, MfccConfig, PitchConfig

    samples, sr = _speech()
    for n_coeffs in (13, 12):
        cfg = AnalysisConfig(
            sr, 2048, 512,
            PitchConfig(enabled=False),
            FormantConfig(n_coeffs=n_coeffs),
            MfccConfig(enabled=False),
        )
        from voxtpu.pipeline import analyze_frames

        f64 = analyze_frames(
            frame_signal(jnp.asarray(samples, jnp.float64), cfg.frame_len, cfg.hop),
            cfg,
        )
        frames32 = frame_signal(
            jnp.asarray(samples, jnp.float32), cfg.frame_len, cfg.hop
        )
        for label, fcfg in (
            ("unpolished", dataclasses.replace(cfg, formant=dataclasses.replace(cfg.formant, polish=False))),
            ("polished", cfg),
        ):
            f32 = analyze_frames(frames32, fcfg)
            df = np.abs(np.asarray(f32["formant_freqs"], np.float64)
                        - np.asarray(f64["formant_freqs"], np.float64))
            db = np.abs(np.asarray(f32["formant_bws"], np.float64)
                        - np.asarray(f64["formant_bws"], np.float64))
            print(
                f"order {n_coeffs:2d} {label:11s}: formant_freqs worst "
                f"{df.max():8.4f} Hz (p99 {np.percentile(df, 99):7.4f})   "
                f"bws worst {db.max():8.4f} Hz",
                flush=True,
            )

    # Plain-f32 Newton A/B: same steps, uncompensated residual — shows the
    # double-f32 evaluation is the load-bearing part.
    import jax

    from voxtpu.cplx import C
    from voxtpu.formants import MAX_RESONANCES  # noqa: F401
    from voxtpu.lpc import burg
    from voxtpu.roots import find_roots, polish_roots, _horner_df
    from voxtpu.windows import hann

    n_coeffs = 13
    frames32 = frame_signal(jnp.asarray(samples, jnp.float32), 2048, 512)
    buf = frames32 * jnp.asarray(hann(2048), jnp.float32)
    coeffs, _ = burg(buf, n_coeffs)
    ones = jnp.ones((buf.shape[0], 1), jnp.float32)
    pre = jnp.concatenate([coeffs[:, ::-1], ones], axis=-1)
    poly = C(pre, jnp.zeros_like(pre))
    roots32, _c, _s = find_roots(poly, backend="jnp")

    buf64 = frames32.astype(jnp.float64) * jnp.asarray(hann(2048), jnp.float64)
    c64, _ = burg(buf64, n_coeffs)
    pre64 = jnp.concatenate([c64[:, ::-1], jnp.ones((buf.shape[0], 1), jnp.float64)], axis=-1)
    roots64, _c, _s = find_roots(C(pre64, jnp.zeros_like(pre64)), backend="jnp")

    def angle_err(r):
        a32 = np.angle(np.asarray(r.re, np.float64) + 1j * np.asarray(r.im, np.float64))
        a64 = np.angle(np.asarray(roots64.re) + 1j * np.asarray(roots64.im))
        m = (np.asarray(roots64.im) > 0) & (np.asarray(r.im) > 0)
        return np.abs(np.sort(np.where(m, a32, 0.0), axis=-1)
                      - np.sort(np.where(m, a64, 0.0), axis=-1)).max() * 44100 / (2 * np.pi)

    def plain_newton(c, roots, iters=2):
        zr = roots.re
        zi = roots.im
        live = (zr != 0) | (zi != 0)
        for _ in range(iters):
            # plain f32 Horner for p and p'
            N = c.re.shape[-1]
            zero = jnp.zeros_like(zr)
            ar = c.re[..., N - 1][..., None] + zero
            ai = zero
            br = zero
            bi = zero
            for j in range(N - 2, -1, -1):
                br, bi = br * zr - bi * zi + ar, br * zi + bi * zr + ai
                ar, ai = (ar * zr - ai * zi + c.re[..., j][..., None],
                          ar * zi + ai * zr)
            den = br * br + bi * bi
            dzr = (ar * br + ai * bi) / den
            dzi = (ai * br - ar * bi) / den
            ok = jnp.isfinite(dzr) & jnp.isfinite(dzi) & (dzr * dzr + dzi * dzi < 0.25) & live
            zr = jnp.where(ok, zr - dzr, zr)
            zi = jnp.where(ok, zi - dzi, zi)
        return C(zr, zi)

    print(
        "root angle worst error vs f64 roots (Hz at 44.1k):  "
        f"unpolished {angle_err(roots32):.4f}   "
        f"plain-f32 Newton {angle_err(plain_newton(poly, roots32)):.4f}   "
        f"compensated {angle_err(polish_roots(poly, roots32)):.4f}",
        flush=True,
    )
    _ = jax, _horner_df  # imports used above


def tpu_cost():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses

    from voxtpu.frame import frame_signal
    from voxtpu.pipeline import (
        AnalysisConfig, FormantConfig, MfccConfig, PitchConfig, analyze_frames,
    )

    samples, sr = _speech()
    sig = np.tile(samples.astype(np.float32), 42)
    n, hop = 4096, 1024
    frames = jax.device_put(jnp.asarray(
        np.lib.stride_tricks.sliding_window_view(sig, n)[::hop], jnp.float32
    ))
    print(f"frames={frames.shape[0]} n={n}", flush=True)
    base = AnalysisConfig(
        sr, n, hop,
        PitchConfig(threshold=0.2, fmin=60.0, fmax=600.0, max_candidates=32),
        FormantConfig(n_coeffs=13),
        MfccConfig(num_coeffs=13, freq_lo=100.0, freq_hi=8000.0),
    )
    for label, cfg in (
        ("polish off", dataclasses.replace(base, formant=dataclasses.replace(base.formant, polish=False))),
        ("polish on ", base),
    ):
        fn = jax.jit(lambda x, c=cfg: sum(
            jnp.sum(jnp.abs(v)) for k, v in analyze_frames(x, c).items()
            if k != "hnr_db"
        ))
        float(np.asarray(fn(frames)))  # compile + warm
        best = 1e9
        for _ in range(9):
            t0 = time.perf_counter()
            float(np.asarray(fn(frames)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best * 1e3:7.2f} ms full pipeline", flush=True)


if __name__ == "__main__":
    if "--tpu" in sys.argv:
        tpu_cost()
    else:
        accuracy()
