"""Record oracle traces for ADVERSARIAL fixtures (VERDICT r4 #5).

The compound paths pinned only once (Brent-over-sinc pitch refinement
trajectories, periodic.rs:377-456; McCandless slot tie-breaking,
spectrum.rs:225-334) get stress fixtures chosen to drive them off the happy
path: strong DC offset, hard-clipped speech, a silence->voicing onset, a
near-Nyquist tone, and an octave-jump glide — each at 8 kHz and 44.1 kHz.
Signals are deterministic and stored IN the npz (float64, no WAV
quantization), so the tests replay byte-identical inputs.

Writes tests/fixtures/adversarial_traces.npz with, per (signal, rate):
  {tag}_signal, {tag}_formant_freqs/_bws, {tag}_pitch_freq/_strength/_count

Run on CPU: `python scripts/record_adversarial_traces.py` (slow; the scalar
oracle's sinc refinement is pure Python — budget ~15 min).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import cpu_env  # noqa: F401,E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import reference_impl as ref  # noqa: E402
from util import synth_vowel  # noqa: E402

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures"
)

FMTS_A = [(730.0, 60.0), (1090.0, 80.0), (2440.0, 120.0)]
FMTS_I = [(270.0, 50.0), (2290.0, 90.0), (3010.0, 150.0)]

# (rate, seconds, formant bin/hop/order, pitch bin/hop/fmax, capacity)
# Capacity 320 stores EVERY oracle candidate (the noisy fixtures reach ~300
# spurious maxima): the comparison must never depend on which side a
# truncation keeps (the oracle list is strength-sorted, the library's
# capacity keeps lowest-lag — different sets when truncated).
RATE_CFG = {
    8000: (0.55, 512, 256, 10, 512, 256, 500.0, 320),
    44100: (0.45, 2048, 1024, 13, 2048, 1024, 500.0, 320),
}


def signals(sr: int, seconds: float) -> dict:
    rng = np.random.default_rng(97 + sr % 1000)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    vowel = synth_vowel(sr, 140.0, FMTS_A, n, noise=0.01, seed=11 + sr % 7)
    half = n // 2
    sigs = {}
    # Strong DC offset: the AC quirk's x[0] seed and Burg's mean-free
    # assumption both see a shifted signal.
    sigs["dc"] = 0.5 * vowel + 0.4
    # Hard clipping: flat-topped periods put odd-harmonic energy everywhere;
    # stresses maxima picking and the Brent refinement's non-parabolic peaks.
    sigs["clip"] = np.clip(3.0 * vowel, -0.8, 0.8)
    # Silence -> voicing onset: near-zero frames then speech; transition
    # frames mix the two regimes (NOT exact zeros — the reference caller
    # errors on degenerate LPC; the library's zero-frame path has its own
    # tests).
    quiet = 5e-4 * rng.standard_normal(half)
    sigs["onset"] = np.concatenate([quiet, vowel[: n - half]])
    # Near-Nyquist tone + weak low tone: resonances at the mel/band edges,
    # lag-1 autocorrelation structure.
    sigs["nyquist"] = (0.35 * np.sin(2 * np.pi * (0.47 * sr) * t)
                       + 0.2 * np.sin(2 * np.pi * 180.0 * t)
                       + 0.003 * rng.standard_normal(n))
    # Octave jump: 190 Hz -> 380 Hz mid-signal (the classic Viterbi
    # octave-cost scenario; candidate sets must be right on both sides).
    # Both halves keep the /a/ formants: with FMTS_I the 380 Hz source sits
    # ABOVE F1=270 and the half has no stable periodicity to track — the
    # point is a clean octave, not an unvoicable signal.
    lo = synth_vowel(sr, 190.0, FMTS_A, half, noise=0.008, seed=5)
    hi = synth_vowel(sr, 380.0, FMTS_A, n - half, noise=0.008, seed=6)
    sigs["octave"] = np.concatenate([lo, hi])
    return sigs


def main():
    path = os.path.join(FIX, "adversarial_traces.npz")
    out = {}
    for sr, (secs, fbin, fhop, order, pbin, phop, fmax, cap) in RATE_CFG.items():
        for name, x in signals(sr, secs).items():
            tag = f"adv_{name}_{sr}"
            out[f"{tag}_signal"] = x

            formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
            F = (len(x) - fbin) // fhop + 1
            ff, fb = [], []
            for i in range(F):
                frame = x[i * fhop : i * fhop + fbin].copy()
                ref.find_formants_frame(frame, float(sr), 1.0, order, formants)
                ff.append([f for f, _ in formants])
                fb.append([b for _, b in formants])
            out[f"{tag}_formant_freqs"] = np.asarray(ff)
            out[f"{tag}_formant_bws"] = np.asarray(fb)

            w = ref.hanning(pbin)
            Fp = (len(x) - pbin) // phop + 1
            cf = np.zeros((Fp, cap))
            cs = np.zeros((Fp, cap))
            cn = np.zeros(Fp, dtype=np.int32)
            for i in range(Fp):
                frame = x[i * phop : i * phop + pbin] * w
                cands = ref.pitch(frame, float(sr), 0.2, 1.0, 1.0, 60.0, fmax)
                cn[i] = len(cands)
                for j, (f, s) in enumerate(cands[:cap]):
                    cf[i, j], cs[i, j] = f, s
            out[f"{tag}_pitch_freq"] = cf
            out[f"{tag}_pitch_strength"] = cs
            out[f"{tag}_pitch_count"] = cn
            print(f"{tag}: formants F={F}, pitch F={Fp}, "
                  f"max candidates {cn.max()}", flush=True)

    np.savez_compressed(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
