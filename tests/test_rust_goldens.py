"""Frame-for-frame parity of the transcription oracle against goldens
captured from the ACTUAL reference Rust crate (VERDICT r3 #2).

Skipped unless tests/fixtures/rust_goldens.jsonl exists — produce it with
scripts/capture_rust_goldens.sh on a machine with a Rust toolchain (the build
image has none). Once present, this is the strongest link in the parity
chain: oracle vs the real binary, not oracle vs itself.

Record formats and analysis configs are defined by
scripts/rust_golden_harness.rs; the oracle replays the identical configs here.
"""

import json
import math
import os

import numpy as np
import pytest

import reference_impl as ref
from voxtpu.io_wav import read_wav
from voxtpu.frame import num_frames

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
GOLDENS = os.path.join(FIXTURES, "rust_goldens.jsonl")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDENS),
    reason="rust_goldens.jsonl absent — run scripts/capture_rust_goldens.sh "
    "with a Rust toolchain to enable",
)


def _load():
    records = {}
    with open(GOLDENS) as f:
        for line in f:
            r = json.loads(line)
            records.setdefault((r["kind"], r["file"]), []).append(r)
    for v in records.values():
        v.sort(key=lambda r: r["frame"])
    return records


def _samples(name):
    wav = read_wav(os.path.join(FIXTURES, name))
    return np.asarray(wav.samples, dtype=np.float64), float(wav.sample_rate)


def _rect_frames(samples, bin_, hop):
    # Mirrors sample::window::Windower::rectangle — the tail frame may be
    # shorter than bin_ (tests/lib.rs:76 `frame.take(bin)`).
    out = []
    for i in range(num_frames(len(samples), bin_, hop)):
        out.append(samples[i * hop : i * hop + bin_].copy())
    return out


@pytest.mark.parametrize("name", ["short_sample.wav", "down_sampled.wav"])
def test_formants_oracle_vs_rust(name):
    records = _load().get(("formants", name))
    assert records, f"no formant goldens for {name}"
    samples, sr = _samples(name)
    bin_, hop, n_coeffs = 1024, 512, 10
    formants = [(f, 1.0) for f in ref.MALE_FORMANT_ESTIMATES]
    frames = _rect_frames(samples, bin_, hop)
    assert len(records) == len(frames)
    for rec, frame in zip(records, frames):
        ref.find_formants_frame(frame, sr, 1.0, n_coeffs, formants)
        got = np.asarray(formants, dtype=np.float64)
        exp = np.asarray(
            [[x if x is not None else np.nan for x in slot] for slot in rec["slots"]]
        )
        np.testing.assert_allclose(
            got, exp, rtol=1e-9, atol=1e-9,
            err_msg=f"{name} frame {rec['frame']}",
        )


@pytest.mark.parametrize("name", ["short_sample.wav", "down_sampled.wav"])
def test_pitch_oracle_vs_rust(name):
    records = _load().get(("pitch", name))
    assert records, f"no pitch goldens for {name}"
    samples, sr = _samples(name)
    bin_, hop = 2048, 1024
    w = ref.hanning(bin_)
    frames = [f for f in _rect_frames(samples, bin_, hop) if len(f) == bin_]
    assert len(records) == len(frames)
    for rec, frame in zip(records, frames):
        cands = ref.pitch(frame * w, sr, 0.2, 1.0, 1.0, 60.0, 500.0)
        exp = rec["cands"]
        assert len(cands) == len(exp), f"{name} frame {rec['frame']}: count"
        for (gf, gs), (ef, es) in zip(cands, exp):
            assert math.isclose(gf, ef, rel_tol=1e-9, abs_tol=1e-9)
            assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-9)


@pytest.mark.parametrize("name", ["short_sample.wav", "down_sampled.wav"])
def test_mfcc_oracle_vs_rust(name):
    records = _load().get(("mfcc", name))
    assert records, f"no mfcc goldens for {name}"
    samples, sr = _samples(name)
    bin_, hop = 512, 256
    w = ref.hanning(bin_)
    frames = [f for f in _rect_frames(samples, bin_, hop) if len(f) == bin_]
    assert len(records) == len(frames)
    for rec, frame in zip(records, frames):
        got = ref.mfcc(frame * w, 13, (100.0, 4000.0), sr)
        exp = np.asarray(
            [x if x is not None else np.nan for x in rec["coeffs"]], dtype=np.float64
        )
        np.testing.assert_allclose(
            got, exp, rtol=1e-9, atol=1e-9, equal_nan=True,
            err_msg=f"{name} frame {rec['frame']}",
        )
