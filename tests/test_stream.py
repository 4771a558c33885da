"""analyze_stream: bounded-memory streaming with an exact formant carry."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from voxtpu.io_wav import read_wav
from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze,
    analyze_stream,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _cfg(sr, viterbi=False):
    return AnalysisConfig(
        sr, 512, 256,
        PitchConfig(fmin=100.0, fmax=500.0, max_candidates=16, viterbi=viterbi),
        FormantConfig(n_coeffs=10),
        MfccConfig(num_coeffs=13, freq_hi=5000.0),
    )


def test_stream_equals_one_shot_ragged_blocks():
    """Irregular block sizes (simulating a mic/pipe) + chunk_frames smaller
    than the recording: concatenated yields == one-shot analyze, exactly."""
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    cfg = _cfg(float(wav.sample_rate))
    one = analyze(wav.samples, cfg)

    rng = np.random.default_rng(3)
    blocks, i = [], 0
    while i < len(wav.samples):
        k = int(rng.integers(100, 900))
        blocks.append(wav.samples[i : i + k])
        i += k
    blocks.insert(2, np.zeros(0))  # empty block must be harmless

    chunks = list(analyze_stream(iter(blocks), cfg, chunk_frames=3))
    assert len(chunks) >= 3  # actually streamed, not one shot
    for k in one:
        got = np.concatenate([np.asarray(c[k]) for c in chunks])
        np.testing.assert_allclose(got, np.asarray(one[k]), rtol=1e-9, atol=0,
                                   err_msg=k)


def test_stream_single_giant_block_drains():
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    cfg = _cfg(float(wav.sample_rate))
    chunks = list(analyze_stream([wav.samples], cfg, chunk_frames=4))
    one = analyze(wav.samples, cfg)
    got = np.concatenate([np.asarray(c["formant_freqs"]) for c in chunks])
    np.testing.assert_allclose(got, np.asarray(one["formant_freqs"]), rtol=1e-9)


def test_stream_rejects_viterbi():
    cfg = _cfg(11025.0, viterbi=True)
    with pytest.raises(ValueError, match="Viterbi"):
        next(analyze_stream([np.zeros(4096)], cfg))
