"""Frame-for-frame parity on the bundled reference WAVs.

Mirrors /root/reference/tests/lib.rs:
- test_formant_calculation (lib.rs:44-90): short_sample.wav, rectangular
  frames 1024/512, Burg order 10, male starting estimates, formants tracked
  across frames.
- test_against_praat (lib.rs:13-42): down_sampled.wav as one whole-file call,
  order 13.

The oracle is tests/reference_impl.py (scalar transcription of the Rust); the
system under test is the batched JAX pipeline.
"""

import os

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from voxtpu.io_wav import read_wav
from voxtpu.frame import frame_signal, num_frames
from voxtpu.formants import find_formants, MALE_FORMANT_ESTIMATES

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def oracle_formant_track(samples, sr, bin_, hop, n_coeffs):
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    out = []
    f = num_frames(len(samples), bin_, hop)
    for i in range(f):
        frame = samples[i * hop : i * hop + bin_].copy()
        ref.find_formants_frame(frame, sr, 1.0, n_coeffs, formants)
        out.append(list(formants))
    return np.asarray(out)  # (F, L, 2)


def test_short_sample_formant_parity():
    wav = read_wav(os.path.join(FIXTURES, "short_sample.wav"))
    assert wav.sample_rate == 11025
    samples = wav.samples
    bin_, hop, n_coeffs = 1024, 512, 10

    exp = oracle_formant_track(samples, float(wav.sample_rate), bin_, hop, n_coeffs)

    frames = frame_signal(jnp.asarray(samples), bin_, hop)
    freqs, bws, status = find_formants(frames, float(wav.sample_rate), n_coeffs)
    assert np.all(np.asarray(status) == 0)

    got_f = np.asarray(freqs)
    got_b = np.asarray(bws)
    np.testing.assert_allclose(got_f, exp[:, :, 0], rtol=1e-7, atol=1e-6)
    np.testing.assert_allclose(got_b, exp[:, :, 1], rtol=1e-6, atol=1e-4)


def test_down_sampled_whole_file_parity():
    # lib.rs:13-42 calls find_formants on the *full* file buffer (despite
    # computing a segment first), order 13.
    wav = read_wav(os.path.join(FIXTURES, "down_sampled.wav"))
    samples = wav.samples
    n_coeffs = 13

    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    ref.find_formants_frame(samples.copy(), float(wav.sample_rate), 1.0, n_coeffs, formants)
    exp = np.asarray(formants)

    freqs, bws, status = find_formants(
        jnp.asarray(samples)[None, :], float(wav.sample_rate), n_coeffs
    )
    assert int(np.asarray(status)[0]) == 0
    np.testing.assert_allclose(np.asarray(freqs)[0], exp[:, 0], rtol=1e-7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bws)[0], exp[:, 1], rtol=1e-6, atol=1e-4)


def test_two_vowels_resampled_parity():
    # examples/formant_extraction/src/main.rs:53-88: 44.1k -> 10k resample
    # ratio, 50 ms bins, 10 ms hops, order 13. Run the first 12 frames.
    wav = read_wav(os.path.join(FIXTURES, "sample-two_vowels.wav"))
    sr = float(wav.sample_rate)
    new_rate = 10000.0
    ratio = new_rate / sr
    bin_ = int(np.ceil(new_rate * 0.05))
    hop = int(np.ceil(new_rate * 0.01))
    n_coeffs = 13
    nf = 12

    samples = wav.samples[: (nf - 1) * hop + bin_]
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    exp = []
    for i in range(nf):
        frame = samples[i * hop : i * hop + bin_].copy()
        ref.find_formants_frame(frame, new_rate, ratio, n_coeffs, formants)
        exp.append(list(formants))
    exp = np.asarray(exp)

    frames = frame_signal(jnp.asarray(samples), bin_, hop)
    freqs, bws, status = find_formants(frames, new_rate, n_coeffs, resample_ratio=ratio)
    np.testing.assert_allclose(np.asarray(freqs), exp[:, :, 0], rtol=1e-6, atol=1e-5)
