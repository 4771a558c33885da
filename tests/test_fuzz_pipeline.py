"""Fuzzed full-pipeline parity vs the scalar oracle on synthetic vowels.

VERDICT r1 #6 / ROADMAP "fuzz the full find_formants pipeline": randomized
source-filter vowels with known formant structure are run through the whole
batched `find_formants` (resample -> window -> Burg -> Laguerre roots ->
resonances -> McCandless carry) and compared frame-for-frame against the
scalar transcription of the Rust reference (lib.rs:40-116) — not just the
tracker step in isolation.
"""

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from util import synth_vowel
from voxtpu.formants import find_formants
from voxtpu.frame import frame_signal, num_frames
from voxtpu.pitch import pitch_frames
from voxtpu.windows import hann


def _oracle_track(samples, sr, bin_, hop, n_coeffs, ratio=1.0):
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    out = []
    for i in range(num_frames(len(samples), bin_, hop)):
        frame = samples[i * hop : i * hop + bin_].copy()
        ref.find_formants_frame(frame, sr, ratio, n_coeffs, formants)
        out.append(list(formants))
    return np.asarray(out)  # (F, L, 2)


def test_find_formants_fuzz_synthetic_vowels():
    sr = 11025.0
    bin_, hop, n_coeffs = 1024, 512, 10
    cases = [
        # (f0, [(F, bw)...], noise)
        (110.0, [(730.0, 60.0), (1090.0, 80.0), (2440.0, 120.0)], 0.01),  # /a/
        (200.0, [(270.0, 50.0), (2290.0, 90.0), (3010.0, 150.0)], 0.02),  # /i/
        (145.0, [(530.0, 55.0), (1840.0, 85.0), (2480.0, 130.0)], 0.05),  # /e/
    ]
    for seed, (f0, fmts, noise) in enumerate(cases):
        n = 7 * hop + bin_  # 8 frames
        x = synth_vowel(sr, f0, fmts, n, noise=noise, seed=seed)

        exp = _oracle_track(x, sr, bin_, hop, n_coeffs)
        frames = frame_signal(jnp.asarray(x), bin_, hop)
        freqs, bws, status = find_formants(frames, sr, n_coeffs)

        np.testing.assert_allclose(
            np.asarray(freqs), exp[:, :, 0], rtol=1e-7, atol=1e-5,
            err_msg=f"case {seed} freqs",
        )
        np.testing.assert_allclose(
            np.asarray(bws), exp[:, :, 1], rtol=1e-6, atol=1e-4,
            err_msg=f"case {seed} bws",
        )
        # sanity vs ground truth: tracked F1 near the synthesized F1 on at
        # least the later frames (the carry has warmed up by then)
        got_f1 = np.asarray(freqs)[4:, 0]
        assert np.all(np.abs(got_f1 - fmts[0][0]) < 0.25 * fmts[0][0]), (
            seed, got_f1, fmts[0][0],
        )


def test_find_formants_fuzz_resampled():
    """Same fuzz through the resample path (ratio != 1, lib.rs:53-63)."""
    sr_in = 16000.0
    new_rate = 10000.0
    ratio = new_rate / sr_in
    bin_ = int(np.ceil(new_rate * 0.05))
    hop = int(np.ceil(new_rate * 0.01))
    n_coeffs = 13

    x = synth_vowel(
        sr_in, 120.0, [(600.0, 60.0), (1400.0, 90.0), (2600.0, 140.0)],
        9 * hop + bin_, noise=0.02, seed=7,
    )
    exp = _oracle_track(x, new_rate, bin_, hop, n_coeffs, ratio=ratio)
    frames = frame_signal(jnp.asarray(x), bin_, hop)
    freqs, _bws, _status = find_formants(frames, new_rate, n_coeffs, resample_ratio=ratio)
    np.testing.assert_allclose(np.asarray(freqs), exp[:, :, 0], rtol=1e-6, atol=1e-5)


def test_pitch_fuzz_synthetic_vowels():
    """Pitch candidate parity on the fuzz vowels: the full candidate set
    (freq+strength, ordered) must match the oracle frame-for-frame."""
    sr = 11025.0
    bin_, hop = 512, 256
    w = np.asarray(hann(bin_))
    for seed, f0 in enumerate((120.0, 180.0, 240.0)):
        n = 5 * hop + bin_
        x = synth_vowel(
            sr, f0, [(700.0, 60.0), (1200.0, 90.0)], n, noise=0.02, seed=30 + seed
        )
        frames = np.stack(
            [x[i * hop : i * hop + bin_] * w for i in range(num_frames(n, bin_, hop))]
        )
        freq, strength, valid = pitch_frames(
            jnp.asarray(frames), sr, threshold=0.2, fmin=60.0, fmax=500.0
        )
        freq, strength, valid = map(np.asarray, (freq, strength, valid))
        for i, frame in enumerate(frames):
            exp = ref.pitch(frame, sr, 0.2, 1.0, 1.0, 60.0, 500.0)
            got_f, got_s = freq[i][valid[i]], strength[i][valid[i]]
            assert len(got_f) == len(exp), (seed, i, len(got_f), len(exp))
            # Compare candidate *sets* (sort may swap fp-equal strengths).
            exp_sorted = sorted(exp, key=lambda p: (round(-p[1], 9), p[0]))
            got_sorted = sorted(zip(got_f, got_s), key=lambda p: (round(-p[1], 9), p[0]))
            for (ef, es), (gf, gs) in zip(exp_sorted, got_sorted):
                np.testing.assert_allclose(gf, ef, rtol=1e-5, atol=1e-8,
                                           err_msg=f"seed {seed} frame {i}")
                np.testing.assert_allclose(gs, es, rtol=1e-5, atol=1e-7,
                                           err_msg=f"seed {seed} frame {i}")
