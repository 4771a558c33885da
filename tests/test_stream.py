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


def test_stream_finalize_viterbi_matches_one_shot():
    """Stream with viterbi=False, then finalize_viterbi == one-shot
    analyze(viterbi=True): the DP and the global intensity peak span the
    whole stream."""
    from voxtpu.pipeline import finalize_viterbi

    rng = np.random.default_rng(9)
    sr = 11025.0
    t = np.arange(14 * 256 + 512) / sr
    x = np.sin(2 * np.pi * 210 * t)
    x[len(x) // 2 :] *= 0.001  # quiet tail exercises the silence-aware score
    x = x + 0.0005 * rng.standard_normal(t.shape)

    one = analyze(x, _cfg(sr, viterbi=True))
    chunks = list(analyze_stream([x[:3000], x[3000:]], _cfg(sr), chunk_frames=5))
    full = finalize_viterbi(chunks, _cfg(sr))
    for k in ("f0", "f0_strength", "hnr_db"):
        np.testing.assert_allclose(
            np.asarray(full[k]), np.asarray(one[k]), rtol=1e-9, atol=1e-12,
            err_msg=k,
        )
