"""Frame-for-frame parity against *recorded* reference-semantics traces.

The traces (tests/fixtures/reference_traces.npz) were produced by
scripts/record_reference_traces.py from the scalar oracle; these tests pin
the batched implementation against them without re-running the slow oracle —
and pin the oracle itself against accidental edits.
"""

import os

import numpy as np
import jax.numpy as jnp

from voxtpu.io_wav import read_wav
from voxtpu.frame import frame_signal
from voxtpu.formants import find_formants
from voxtpu.pitch import pitch_frames
from voxtpu.mfcc import mfcc

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
TRACES = np.load(os.path.join(FIX, "reference_traces.npz"))


def test_short_sample_formant_trace():
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    frames = frame_signal(jnp.asarray(wav.samples), 1024, 512)
    freqs, bws, status = find_formants(frames, float(wav.sample_rate), 10)
    np.testing.assert_allclose(
        np.asarray(freqs), TRACES["short_formant_freqs"], rtol=1e-7, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bws), TRACES["short_formant_bws"], rtol=1e-6, atol=1e-4
    )


def test_short_sample_pitch_trace():
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    frames = frame_signal(jnp.asarray(wav.samples), 512, 256, window="hanning")
    freq, strength, valid = pitch_frames(
        frames, float(wav.sample_rate), threshold=0.2, fmin=60.0, fmax=500.0
    )
    freq, strength, valid = map(np.asarray, (freq, strength, valid))
    for i in range(frames.shape[0]):
        n = int(TRACES["short_pitch_count"][i])
        got = sorted(zip(freq[i][valid[i]], strength[i][valid[i]]),
                     key=lambda p: (round(-p[1], 9), p[0]))
        exp = sorted(zip(TRACES["short_pitch_freq"][i][:n],
                         TRACES["short_pitch_strength"][i][:n]),
                     key=lambda p: (round(-p[1], 9), p[0]))
        assert len(got) == n
        for (gf, gs), (ef, es) in zip(got, exp):
            np.testing.assert_allclose(gf, ef, rtol=1e-5, atol=1e-8)
            np.testing.assert_allclose(gs, es, rtol=1e-5, atol=1e-7)


def test_short_sample_mfcc_trace():
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    frames = frame_signal(jnp.asarray(wav.samples), 512, 256, window="hanning")
    got = np.asarray(mfcc(frames, 13, (100.0, 5000.0), float(wav.sample_rate)))
    np.testing.assert_allclose(got, TRACES["short_mfcc"], rtol=1e-8, atol=1e-9)


def test_down_sampled_formant_trace():
    wav = read_wav(os.path.join(FIX, "down_sampled.wav"))
    freqs, bws, status = find_formants(
        jnp.asarray(wav.samples)[None, :], float(wav.sample_rate), 13
    )
    exp = TRACES["down_formants"]
    np.testing.assert_allclose(np.asarray(freqs)[0], exp[:, 0], rtol=1e-7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bws)[0], exp[:, 1], rtol=1e-6, atol=1e-4)
