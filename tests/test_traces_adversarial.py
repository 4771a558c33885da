"""Adversarial recorded-trace parity (VERDICT r4 #5).

The once-pinned compound paths — Brent-over-sinc pitch refinement
trajectories (periodic.rs:377-456) and McCandless slot assignment/
tie-breaking (spectrum.rs:225-334) — replayed frame-for-frame against the
scalar oracle on stress signals: strong DC offset, hard-clipped speech, a
silence->voicing onset, a near-Nyquist tone, and an octave-jump glide, each
at 8 kHz and 44.1 kHz. Signals live IN the npz (float64, no WAV
quantization); traces were recorded by scripts/record_adversarial_traces.py.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from voxtpu.formants import find_formants
from voxtpu.frame import frame_signal
from voxtpu.pitch import pitch_frames
from voxtpu.windows import hann

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
TRACES = np.load(os.path.join(FIX, "adversarial_traces.npz"))

# Mirrors scripts/record_adversarial_traces.py RATE_CFG (capacity there is
# the recorder's storage slots = 320, enough for EVERY oracle candidate).
# The library capacity here is chosen PAST the in-band lag window width
# (pitch.py lag_lo..lag_hi: 197 lags at 8 kHz, 775 at 44.1 kHz), which makes
# the compaction take the simple top_k path and — more importantly — makes
# truncation impossible on both sides, so candidate SETS compare exactly
# (the oracle list is strength-sorted; a capacity cut would keep different
# members than the library's lowest-lag rule, deviation 1). At 8 kHz the
# request (340) exceeds the maxima axis itself (bi-2 = 254 centers) — the
# library clamps and pads (test_pitch.py::test_overcapacity_clamps_and_pads),
# so these cases also exercise the over-capacity path end to end.
RATE_CFG = {
    8000: (512, 256, 10, 512, 256, 500.0, 340),
    44100: (2048, 1024, 13, 2048, 1024, 500.0, 780),
}
NAMES = ("dc", "clip", "onset", "nyquist", "octave")
CASES = [(n, sr) for sr in RATE_CFG for n in NAMES]
IDS = [f"{n}-{sr}" for n, sr in CASES]


@pytest.mark.parametrize("name,sr", CASES, ids=IDS)
def test_adversarial_formant_trace(name, sr):
    fbin, fhop, order, *_ = RATE_CFG[sr]
    tag = f"adv_{name}_{sr}"
    x = TRACES[f"{tag}_signal"]
    frames = frame_signal(jnp.asarray(x), fbin, fhop)
    freqs, bws, _status = find_formants(frames, float(sr), order)
    np.testing.assert_allclose(
        np.asarray(freqs), TRACES[f"{tag}_formant_freqs"], rtol=1e-7, atol=1e-5,
        err_msg=f"{tag} freqs",
    )
    np.testing.assert_allclose(
        np.asarray(bws), TRACES[f"{tag}_formant_bws"], rtol=1e-7, atol=1e-5,
        err_msg=f"{tag} bws",
    )


@pytest.mark.parametrize("name,sr", CASES, ids=IDS)
def test_adversarial_pitch_trace(name, sr):
    """Candidate-set parity against the oracle under stress, with the
    comparison discipline test_traces_rates.py established: candidates
    paired by FREQUENCY (near-tied strengths flip rank between the FFT path
    and the oracle's naive AC — deviation 7) and the integer-snap knife-edge
    tolerance (deviation 8). Capacities exceed both the in-band lag window
    and every observed count, so the comparison is the FULL candidate set —
    no truncation semantics in play."""
    _fb, _fh, _o, pbin, phop, fmax, cap = RATE_CFG[sr]
    tag = f"adv_{name}_{sr}"
    x = TRACES[f"{tag}_signal"]
    frames = frame_signal(jnp.asarray(x), pbin, phop) * jnp.asarray(hann(pbin))
    freq, strength, valid = pitch_frames(
        frames, float(sr), threshold=0.2, fmin=60.0, fmax=fmax,
        max_candidates=cap,
    )
    freq, strength, valid = map(np.asarray, (freq, strength, valid))
    ef = TRACES[f"{tag}_pitch_freq"]
    es = TRACES[f"{tag}_pitch_strength"]
    en = TRACES[f"{tag}_pitch_count"]
    srf = float(sr)
    for i in range(frames.shape[0]):
        got_f, got_s = freq[i][valid[i]], strength[i][valid[i]]
        k = int(en[i])
        assert len(got_f) == k, (tag, i, len(got_f), en[i])
        exp_sorted = sorted(zip(ef[i, :k], es[i, :k]))
        got_sorted = sorted(zip(got_f, got_s))
        for (f1, s1), (f2, s2) in zip(exp_sorted, got_sorted):
            lags = [srf / f for f in (f1, f2) if f > 0]
            knife = any(abs(l - round(l)) < 2e-3 for l in lags)
            # The nyquist fixture manufactures a harder knife: its AC
            # oscillates with ~2.13-lag period, so anti-correlation maxima
            # (strength deep below 0, > 0.2 under the unvoiced threshold —
            # unreachable by any voicing decision) sit where the sinc
            # interpolant's continuum max (lag k+0.1) and the snapped
            # integer sample (lag k) are near-tied; which one a Brent
            # trajectory lands on is deviation-8 chaos. Both recorded sides
            # show BOTH outcomes across frames (e.g. 431.93<->432.35 Hz at
            # lags 102.1/102.0). Only such negative-strength knife
            # candidates get the wide band; candidates that can matter keep
            # the tight one.
            junk = knife and s1 < 0 and s2 < 0
            rt = 1e-2 if junk else (5e-3 if knife else 1e-5)
            np.testing.assert_allclose(
                f2, f1, rtol=rt, atol=1e-8, err_msg=f"{tag} frame {i}"
            )
            np.testing.assert_allclose(
                s2, s1, rtol=5e-3 if knife else 1e-5,
                atol=0.12 if junk else (0.06 if knife else 1e-6),
                err_msg=f"{tag} frame {i}",
            )


def test_octave_jump_viterbi_is_coherent():
    """The octave fixture's Viterbi check. Praat's cost model may legally
    LOCK ONTO THE SUBHARMONIC after the 190->380 Hz jump (the 380 Hz half's
    autocorrelation is just as strong at the doubled lag, and staying at
    ~190 avoids the octave-jump cost) — so the assertion is path COHERENCE,
    the thing the DP exists to provide: every frame voiced, each half on one
    stable value from {the true f0, its subharmonic}, and no flip-flopping
    (at most one octave-scale transition over the whole track)."""
    from voxtpu.viterbi import PathConfig, pitch_path_host

    sr = 8000
    _fb, _fh, _o, pbin, phop, fmax, cap = RATE_CFG[sr]
    x = TRACES[f"adv_octave_{sr}_signal"]
    frames = frame_signal(jnp.asarray(x), pbin, phop)
    windowed = frames * jnp.asarray(hann(pbin))
    freq, strength, valid = pitch_frames(
        windowed, float(sr), threshold=0.2, fmin=60.0, fmax=fmax,
        max_candidates=cap,
    )
    lp = np.max(np.abs(np.asarray(frames)), axis=-1)
    f0, _s0 = pitch_path_host(
        np.asarray(freq), np.asarray(strength), np.asarray(valid),
        PathConfig(ceiling=fmax),
        local_intensity=lp / np.maximum(np.max(lp), 1e-30),
    )
    F = len(f0)
    lo, hi = f0[: F // 2 - 2], f0[F // 2 + 2:]
    assert np.all(lo > 0) and np.all(hi > 0), f0  # voiced throughout
    assert np.all(np.abs(lo - 190.0) < 20.0), lo
    # 380 Hz or its subharmonic — but ONE of them, stably.
    near_380 = np.abs(hi - 380.0) < 40.0
    near_190 = np.abs(hi - 190.0) < 20.0
    assert np.all(near_380) or np.all(near_190), hi
    voiced = f0[f0 > 0]
    jumps = np.abs(np.diff(np.log2(voiced))) > 0.5
    assert jumps.sum() <= 1, f0
