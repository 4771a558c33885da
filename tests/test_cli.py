"""CLI surface tests (analyze columns/npz, corpus with resume)."""

import json
import os

import numpy as np

from voxtpu.cli import main

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
WAV = os.path.join(FIXTURES, "short_sample.wav")


def test_analyze_columns(capsys):
    rc = main(["analyze", WAV, "--n-coeffs", "10", "--fmax", "500", "--f64"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) > 0
    cols = lines[0].split()
    assert len(cols) == 11  # time + 4*(freq bw) + rms + f0


def test_analyze_npz(tmp_path):
    out = tmp_path / "f.npz"
    rc = main(["analyze", WAV, "-o", str(out), "--viterbi", "--f64"])
    assert rc == 0
    z = np.load(out)
    assert "f0" in z and "formant_freqs" in z and "mfcc" in z
    assert np.all(np.isfinite(z["mfcc"]))


def test_corpus_resume(tmp_path, capsys):
    outdir = tmp_path / "features"
    rc = main(["corpus", WAV, "-o", str(outdir), "--f64"])
    assert rc == 0
    manifest = json.loads((outdir / "manifest.json").read_text())
    assert manifest[WAV]["frames"] > 0

    rc = main(["corpus", WAV, "-o", str(outdir), "--f64"])
    assert rc == 0
    assert "resume skip" in capsys.readouterr().err


def test_corpus_sharded(tmp_path):
    outdir = tmp_path / "sharded"
    rc = main(["corpus", WAV, "-o", str(outdir), "--f64", "--sharded", "--no-resume"])
    assert rc == 0
    z = np.load(outdir / "short_sample.npz")
    assert np.all(np.isfinite(z["mfcc"]))

    # matches the unsharded run (after the halo warmup; whole track here)
    outdir2 = tmp_path / "plain"
    rc = main(["corpus", WAV, "-o", str(outdir2), "--f64", "--no-resume"])
    z2 = np.load(outdir2 / "short_sample.npz")
    np.testing.assert_allclose(z["f0"], z2["f0"], rtol=1e-6)


def test_analyze_plot(tmp_path):
    p = tmp_path / "plot.png"
    rc = main(["analyze", WAV, "--fmax", "500", "--f64", "--plot", str(p)])
    assert rc == 0
    assert p.stat().st_size > 5000


def test_analyze_unreadable_file(tmp_path, capsys):
    bad = tmp_path / "bad.wav"
    bad.write_text("not a wav")
    rc = main(["analyze", str(bad), "--f64"])
    assert rc == 1
    assert "cannot read" in capsys.readouterr().err
