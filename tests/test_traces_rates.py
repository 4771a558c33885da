"""8 kHz / 48 kHz recorded-trace parity (widening the rate coverage beyond
the 11025/16000/44100 Hz fixtures).

synth_8k.wav and synth_48k.wav (scripts/make_synth_fixture.py —
deterministic synthetic two-vowel signals) were run through the scalar
oracle by scripts/record_reference_traces.py; these tests pin the batched
pipeline frame-for-frame at the telephony-band and pro-audio rates, where
the rate-dependent paths (lag window span, mel filterbank edges near
Nyquist, Burg conditioning at long frames) differ most from the mid rates.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from voxtpu.io_wav import read_wav
from voxtpu.frame import frame_signal
from voxtpu.formants import find_formants
from voxtpu.mfcc import mfcc
from voxtpu.pitch import pitch_frames

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
TRACES = np.load(os.path.join(FIX, "reference_traces.npz"))

# (tag, wav, sr, formant bin/hop/order, pitch bin/hop/fmax, mel_hi)
CASES = [
    ("synth8k", "synth_8k.wav", 8000.0, 512, 256, 10, 512, 256, 450.0, 3500.0),
    ("synth48k", "synth_48k.wav", 48000.0, 2048, 1024, 12, 1024, 512, 500.0, 8000.0),
]
IDS = [c[0] for c in CASES]


def _wav(name, sr):
    wav = read_wav(os.path.join(FIX, name))
    assert wav.sample_rate == sr
    return wav


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_formant_trace_parity(case):
    tag, name, sr, fbin, fhop, order, *_ = case
    wav = _wav(name, sr)
    frames = frame_signal(jnp.asarray(wav.samples), fbin, fhop)
    freqs, bws, status = find_formants(frames, sr, order)
    np.testing.assert_allclose(
        np.asarray(freqs), TRACES[f"{tag}_formant_freqs"], rtol=1e-7, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bws), TRACES[f"{tag}_formant_bws"], rtol=1e-6, atol=1e-4
    )


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_pitch_trace_parity(case):
    tag, name, sr, _fb, _fh, _o, pbin, phop, fmax, _mel = case
    wav = _wav(name, sr)
    frames = frame_signal(jnp.asarray(wav.samples), pbin, phop, window="hanning")
    # Capacity 47+unvoiced matches the recorder's 48 slots: the noisy 8 kHz
    # vowel frames produce up to 34 oracle candidates, past the default 32.
    freq, strength, valid = pitch_frames(
        frames, sr, threshold=0.2, fmin=60.0, fmax=fmax, max_candidates=47
    )
    freq, strength, valid = map(np.asarray, (freq, strength, valid))
    ef, es, en = (
        TRACES[f"{tag}_pitch_freq"],
        TRACES[f"{tag}_pitch_strength"],
        TRACES[f"{tag}_pitch_count"],
    )
    for i in range(frames.shape[0]):
        got_f, got_s = freq[i][valid[i]], strength[i][valid[i]]
        assert len(got_f) == en[i], (i, len(got_f), en[i])
        # Pair candidates by FREQUENCY, not strength rank: near-tied
        # strengths (delta ~1e-5 between the FFT path and the oracle's naive
        # AC) can flip the strength ordering of unrelated candidates, which
        # would misalign a rank-wise zip. The trace pins the candidate SET;
        # rank under near-ties is the documented deviation-7 chaos class.
        exp_sorted = sorted(zip(ef[i, : en[i]], es[i, : en[i]]))
        got_sorted = sorted(zip(got_f, got_s))
        for (f1, s1), (f2, s2) in zip(exp_sorted, got_sorted):
            # Integer-snap knife edge (PARITY deviation 8): near-integer
            # refined lags make Brent's trajectory sensitive to last-ulp AC
            # differences between the FFT path and the oracle's naive sum.
            # EITHER side may be the one that snapped (the 8 kHz fixture has
            # a frame where the batched path converges to lag 25.0000 and
            # the oracle to 25.0296), so check both lags.
            lags = [sr / f for f in (f1, f2) if f > 0]
            knife = any(abs(l - round(l)) < 2e-3 for l in lags)
            rt = 5e-3 if knife else 1e-5
            np.testing.assert_allclose(f2, f1, rtol=rt, atol=1e-8, err_msg=f"frame {i}")
            # At EXACTLY-integer x the interpolant early-returns the raw
            # sample (periodic.rs:41-42) — a value discontinuity, so a knife
            # candidate's strength can move well past its frequency (the 8 kHz
            # fixture: lag 25.0000 vs 25.0502, strength -0.312 vs -0.276).
            np.testing.assert_allclose(s2, s1, rtol=5e-3 if knife else 1e-5,
                                       atol=0.06 if knife else 1e-7,
                                       err_msg=f"frame {i}")


@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_mfcc_trace_parity(case):
    tag, name, sr, _fb, _fh, _o, pbin, phop, _fmax, mel_hi = case
    wav = _wav(name, sr)
    frames = frame_signal(jnp.asarray(wav.samples), pbin, phop, window="hanning")
    got = mfcc(frames, 13, (100.0, mel_hi), sr)
    np.testing.assert_allclose(
        np.asarray(got), TRACES[f"{tag}_mfcc"], rtol=1e-7, atol=1e-8
    )
