"""CLI surface tests (analyze columns/npz, corpus with resume)."""

import json
import os

import pytest

import numpy as np

from voxtpu.cli import main as cli_main

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
WAV = os.path.join(FIXTURES, "short_sample.wav")


def main(argv):
    """cli_main with --bucket-frames 1024 injected as the leading option.

    --f64 now defaults bucketing OFF (parity mode must not opt into the
    documented batched-FFT-plan deviation silently — ADVICE r3), but the
    cache-less CPU suite measurably NEEDS the one-compiled-shape collapse
    (CLAUDE.md: test_cli 5:11 bucketed vs 9:15 not). Inject the old default
    up front; any explicit --bucket-frames later in argv still wins
    (argparse last-occurrence)."""
    return cli_main([argv[0], "--bucket-frames", "1024"] + argv[1:])


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


def _write_sine_wav(path, freq, sr=11025, seconds=0.6):
    import wave

    t = np.arange(int(sr * seconds)) / sr
    x = (0.7 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


def test_corpus_sharded_dp_over_files(tmp_path):
    """VERDICT r1 #4: the corpus runner must populate BOTH mesh axes — files
    batched into (files, frames, n) blocks — and produce per-file npz that
    matches the serial path, with the mesh recorded in the manifest.
    5 same-config files on 8 virtual devices -> mesh {files: 4, frames: 2},
    two blocks, the second padded from 1 to 4 files."""
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    freqs = {"a": 160.0, "b": 220.0, "c": 280.0, "d": 340.0, "e": 400.0}
    for name, f in freqs.items():
        _write_sine_wav(wavdir / f"{name}.wav", f, seconds=0.4 + 0.05 * f / 100)

    outdir = tmp_path / "sharded"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir),
               "--f64", "--sharded", "--no-resume"])
    assert rc == 0
    manifest = json.loads((outdir / "manifest.json").read_text())
    rec = manifest[str(wavdir / "a.wav")]
    assert rec["mesh"]["files"] > 1 and rec["mesh"]["frames"] > 1, rec["mesh"]

    outdir2 = tmp_path / "plain"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir2),
               "--f64", "--no-resume"])
    assert rc == 0
    for name in freqs:
        z = np.load(outdir / f"{name}.npz")
        z2 = np.load(outdir2 / f"{name}.npz")
        assert set(z.files) == set(z2.files)
        for k in ("formant_freqs", "formant_bws", "rms", "mfcc", "status"):
            np.testing.assert_allclose(z[k], z2[k], rtol=1e-9, err_msg=f"{name}:{k}")
        np.testing.assert_allclose(z["f0"], z2["f0"], rtol=1e-6, err_msg=name)


def test_corpus_sharded_viterbi(tmp_path):
    """--viterbi in the corpus runner: path search runs per file on the
    trimmed candidates (padding frames must not influence the DP)."""
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    _write_sine_wav(wavdir / "x.wav", 190.0, seconds=0.5)
    _write_sine_wav(wavdir / "y.wav", 260.0, seconds=0.7)  # different F: pads

    outdir = tmp_path / "shardedv"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir),
               "--f64", "--sharded", "--viterbi", "--no-resume"])
    assert rc == 0
    outdir2 = tmp_path / "plainv"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir2),
               "--f64", "--viterbi", "--no-resume"])
    assert rc == 0
    for name in ("x", "y"):
        z, z2 = np.load(outdir / f"{name}.npz"), np.load(outdir2 / f"{name}.npz")
        np.testing.assert_allclose(z["f0"], z2["f0"], rtol=1e-6, err_msg=name)
        np.testing.assert_allclose(
            z["f0_strength"], z2["f0_strength"], rtol=1e-6, err_msg=name
        )


def test_corpus_batch_files_matches_serial(tmp_path):
    """--batch-files (single-device corpus batching, VERDICT r4 #2): three
    mixed-length files through one (B, S) analyze_batch_padded program per
    group — with zero-file padding in the last group and in-graph Viterbi —
    must match the per-file path (--batch-files 1) feature-for-feature.
    Covers the valid-frame mask: the middle file's tail frames would
    otherwise read the next file's pad region as real audio."""
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    _write_sine_wav(wavdir / "x.wav", 190.0, seconds=0.45)
    _write_sine_wav(wavdir / "y.wav", 260.0, seconds=0.62)
    _write_sine_wav(wavdir / "z.wav", 330.0, seconds=0.57)

    for extra in ([], ["--viterbi"]):
        outb = tmp_path / ("batched" + "".join(extra))
        rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outb),
                   "--f64", "--batch-files", "2", "--no-resume"] + extra)
        assert rc == 0
        outs = tmp_path / ("serial" + "".join(extra))
        rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outs),
                   "--f64", "--batch-files", "1", "--no-resume"] + extra)
        assert rc == 0
        for name in ("x", "y", "z"):
            zb = np.load(outb / f"{name}.npz")
            zs = np.load(outs / f"{name}.npz")
            assert set(zb.files) == set(zs.files)
            for k in ("formant_freqs", "formant_bws", "rms", "mfcc", "status"):
                np.testing.assert_allclose(
                    zb[k], zs[k], rtol=1e-9, atol=1e-12, err_msg=f"{name}:{k}"
                )
            np.testing.assert_allclose(zb["f0"], zs["f0"], rtol=1e-6, err_msg=name)
            if extra:
                np.testing.assert_allclose(
                    zb["f0_strength"], zs["f0_strength"], rtol=1e-6, err_msg=name
                )


def test_analyze_resample_hz_pins_f0(tmp_path):
    """--resample-hz contract (VERDICT r2 #2): the signal is resampled once
    and ALL features run at the analysis rate — f0 of a known sine must come
    out at the sine's frequency, not scaled by the rate ratio."""
    wav = tmp_path / "sine.wav"
    _write_sine_wav(wav, 150.0, sr=44100, seconds=0.5)
    out = tmp_path / "f.npz"
    # --viterbi: take-best on a *pure* sine picks the sub-octave (the lag
    # window boosts the 2-period lag, and the reference sorts by raw strength,
    # periodic.rs:453); the path search's octave cost resolves it to 150 Hz.
    rc = main(["analyze", str(wav), "-o", str(out), "--f64", "--viterbi",
               "--resample-hz", "11025", "--fmin", "60", "--fmax", "400"])
    assert rc == 0
    z = np.load(out)
    # Frame count at the analysis rate: 11025*0.5 samples, 50 ms/10 ms frames.
    n = int(11025 * 0.5)
    frame_len = int(np.ceil(11025 * 0.05))
    hop = int(np.ceil(11025 * 0.01))
    assert z["f0"].shape[0] == (n - frame_len) // hop + 1
    voiced = z["f0"][z["f0"] > 0]
    assert len(voiced) >= z["f0"].shape[0] - 2
    # +-2.5 Hz: short frames (~7.5 periods per 50 ms) carry a ~1 Hz estimator
    # bias; the bug under test was a rate-ratio (4x) scale error.
    np.testing.assert_allclose(voiced, 150.0, atol=2.5)
    assert np.all(np.isfinite(z["mfcc"]))


def test_analyze_resample_method_sinc(tmp_path):
    """--resample-method sinc wires the bandlimited resampler through the
    CLI: same frame count as linear, f0 still correct."""
    wav = tmp_path / "sine.wav"
    _write_sine_wav(wav, 150.0, sr=44100, seconds=0.4)
    out = tmp_path / "f.npz"
    rc = main(["analyze", str(wav), "-o", str(out), "--f64", "--viterbi",
               "--resample-hz", "11025", "--resample-method", "sinc",
               "--fmin", "60", "--fmax", "400"])
    assert rc == 0
    z = np.load(out)
    voiced = z["f0"][z["f0"] > 0]
    np.testing.assert_allclose(voiced, 150.0, atol=2.5)


def test_corpus_same_stem_no_overwrite(tmp_path):
    """Two inputs with the same basename in different directories must get
    distinct feature files (ADVICE r2: silent overwrite + aliased manifest)."""
    d1, d2 = tmp_path / "spk1", tmp_path / "spk2"
    d1.mkdir(), d2.mkdir()
    _write_sine_wav(d1 / "take.wav", 150.0, seconds=0.4)
    _write_sine_wav(d2 / "take.wav", 190.0, seconds=0.4)
    outdir = tmp_path / "features"
    # --fmin 100 keeps each sine's sub-octave (75/95 Hz) out of band: take-best
    # on a pure sine otherwise prefers it (the lag-window division boosts long
    # lags past the octave cost; see test_analyze_resample_hz_pins_f0).
    rc = main(["corpus", str(d1 / "take.wav"), str(d2 / "take.wav"),
               "-o", str(outdir), "--f64", "--fmin", "100"])
    assert rc == 0
    manifest = json.loads((outdir / "manifest.json").read_text())
    out1 = manifest[str(d1 / "take.wav")]["output"]
    out2 = manifest[str(d2 / "take.wav")]["output"]
    assert out1 != out2
    z1, z2 = np.load(outdir / out1), np.load(outdir / out2)
    assert abs(np.median(z1["f0"]) - 150.0) < 3.0
    assert abs(np.median(z2["f0"]) - 190.0) < 3.0


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


def test_corpus_resume_respects_format(tmp_path):
    """Rerunning with a different --format must NOT resume-skip: the npz from
    run 1 doesn't satisfy a parquet request (code-review r2 finding #1)."""
    pytest.importorskip("pyarrow")
    outdir = tmp_path / "both"
    assert main(["corpus", WAV, "-o", str(outdir), "--f64"]) == 0
    assert (outdir / "short_sample.npz").exists()
    assert main(["corpus", WAV, "-o", str(outdir), "--f64",
                 "--format", "parquet"]) == 0
    assert (outdir / "short_sample.parquet").exists()
    manifest = json.loads((outdir / "manifest.json").read_text())
    assert manifest[WAV]["output"].endswith(".parquet")


def test_bucket_frames_outputs_match_unbucketed(tmp_path):
    """--bucket-frames pads the frame axis to bound compiled-shape count
    across a heterogeneous corpus; outputs must match the unbucketed run
    (exactly up to the documented batch-size FFT-plan class, PARITY
    deviation #5) and have the true frame count."""
    wav = os.path.join(FIXTURES, "sample-two_vowels.wav")
    a, b = tmp_path / "bucketed.npz", tmp_path / "plain.npz"
    assert main(["analyze", wav, "--fmax", "500", "--bucket-frames", "64",
                 "-o", str(a)]) == 0
    assert main(["analyze", wav, "--fmax", "500", "--bucket-frames", "0",
                 "-o", str(b)]) == 0
    xa, xb = np.load(a), np.load(b)
    assert set(xa.files) == set(xb.files)
    for k in xb.files:
        assert xa[k].shape == xb[k].shape, k
        if xb[k].dtype.kind == "f":
            np.testing.assert_allclose(xa[k], xb[k], rtol=1e-5, atol=1e-5,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(xa[k], xb[k], err_msg=k)


def test_corpus_sharded_bucketed_matches_serial(tmp_path):
    """VERDICT r3 #4: --sharded + --bucket-frames together — block frame
    counts round up to the bucket on the mesh, outputs still match the
    serial unbucketed run per file."""
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    for name, f, secs in (("p", 170.0, 0.45), ("q", 230.0, 0.6), ("r", 310.0, 0.52)):
        _write_sine_wav(wavdir / f"{name}.wav", f, seconds=secs)
    outdir = tmp_path / "sb"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir), "--f64",
               "--sharded", "--bucket-frames", "16", "--no-resume"])
    assert rc == 0
    # Serial side also bucketed (bucket-vs-unbucketed equivalence is pinned by
    # test_bucket_frames_outputs_match_unbucketed): keeps this test to ONE
    # serial compiled shape on the cache-less CPU suite.
    outdir2 = tmp_path / "plain"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir2), "--f64",
               "--bucket-frames", "16", "--no-resume"])
    assert rc == 0
    for name in ("p", "q", "r"):
        z, z2 = np.load(outdir / f"{name}.npz"), np.load(outdir2 / f"{name}.npz")
        assert z["rms"].shape == z2["rms"].shape, name
        for k in ("formant_freqs", "rms", "status"):
            np.testing.assert_allclose(z[k], z2[k], rtol=1e-9, err_msg=f"{name}:{k}")
        np.testing.assert_allclose(z["f0"], z2["f0"], rtol=1e-6, err_msg=name)


def test_serve_rejects_unsupported_flags(capsys):
    """serve must refuse flags it would otherwise silently ignore."""
    rc = cli_main(["serve", "--resample-hz", "10000", "--port", "0"])
    assert rc == 2 and "--resample-hz" in capsys.readouterr().err
    rc = cli_main(["serve", "--f64", "--port", "0"])
    assert rc == 2 and "--f64" in capsys.readouterr().err


def test_bucket_ladder_targets():
    """VERDICT r3 #6: small files pad to the measured {64, 256} rungs, not
    the full top bucket; explicit small buckets behave classically."""
    from voxtpu.cli import _bucket_target

    assert _bucket_target(5, 1024) == 64
    assert _bucket_target(64, 1024) == 64
    assert _bucket_target(65, 1024) == 256
    assert _bucket_target(279, 1024) == 1024
    assert _bucket_target(1500, 1024) == 2048
    assert _bucket_target(40, 16) == 48  # bucket below the rungs: classic
    assert _bucket_target(40, 0) == 40  # disabled
    assert _bucket_target(2048, 1024) == 2048  # aligned: no-op


def test_bucket_default_is_mode_dependent():
    """ADVICE r3: --f64 (parity mode) defaults bucketing off; the fast path
    keeps 1024; an explicit value always wins."""
    import argparse

    from voxtpu.cli import _resolve_bucket

    ns = argparse.Namespace(bucket_frames=None, f64=True)
    assert _resolve_bucket(ns) == 0
    ns = argparse.Namespace(bucket_frames=None, f64=False)
    assert _resolve_bucket(ns) == 1024
    ns = argparse.Namespace(bucket_frames=64, f64=True)
    assert _resolve_bucket(ns) == 64
    ns = argparse.Namespace(bucket_frames=0, f64=False)
    assert _resolve_bucket(ns) == 0


def _write_stereo_wav(path, f_left, f_right, sr=11025, seconds=0.5):
    import wave

    t = np.arange(int(sr * seconds)) / sr
    left = (0.7 * np.sin(2 * np.pi * f_left * t) * 32767).astype("<i2")
    right = (0.7 * np.sin(2 * np.pi * f_right * t) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.stack([left, right], axis=1).tobytes())


def test_analyze_stereo_channel_flag(tmp_path, capsys):
    """VERDICT r3 weak #4: stereo input must not be reduced silently, and
    --channel must actually select the channel (different sine per side)."""
    wav = tmp_path / "stereo.wav"
    _write_stereo_wav(wav, 150.0, 250.0)

    def f0_of(extra):
        out = tmp_path / "f.npz"
        rc = main(["analyze", str(wav), "-o", str(out), "--f64", "--viterbi",
                   "--fmin", "100", "--fmax", "400"] + extra)
        assert rc == 0
        z = np.load(out)
        return float(np.median(z["f0"][z["f0"] > 0]))

    f0_default = f0_of([])
    assert "2-channel input" in capsys.readouterr().err  # the stderr note
    assert abs(f0_default - 150.0) < 3.0
    assert abs(f0_of(["--channel", "1"]) - 250.0) < 3.0
    # mix: both sines present; just needs to run and warn, not pick a winner
    f0_mix = f0_of(["--channel", "mix"])
    assert "mixing down" in capsys.readouterr().err
    assert np.isfinite(f0_mix)


def test_analyze_channel_out_of_range(tmp_path, capsys):
    wav = tmp_path / "stereo.wav"
    _write_stereo_wav(wav, 150.0, 250.0, seconds=0.3)
    rc = main(["analyze", str(wav), "--f64", "--channel", "5"])
    assert rc == 1
    assert "out of range" in capsys.readouterr().err


def test_corpus_skips_corrupt_file(tmp_path, capsys):
    """A corrupt WAV in a corpus must not abort the run: the good files are
    processed, the manifest records the error, and the exit code is 0."""
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    _write_sine_wav(wavdir / "good.wav", 200.0, seconds=0.4)
    (wavdir / "bad.wav").write_bytes(b"RIFFxxxxWAVEfmt corrupted!!")
    outdir = tmp_path / "out"
    rc = main(["corpus", str(wavdir / "*.wav"), "-o", str(outdir), "--f64"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "read error" in err or "skipping" in err, err
    manifest = json.loads((outdir / "manifest.json").read_text())
    assert manifest[str(wavdir / "good.wav")]["frames"] > 0
    assert "error" in manifest[str(wavdir / "bad.wav")]
    assert (outdir / "good.npz").exists()
    assert not (outdir / "bad.npz").exists()


def test_cli_rejects_feature_typo(capsys):
    """A misspelled --features entry exits 2 with the allowed list, before
    any backend work (ADVICE r4 coverage of _parse_features validation)."""
    rc = cli_main(["analyze", WAV, "--features", "pitch,formnts"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "formnts" in err and "unknown feature" in err


def test_serve_allowed_rates_flag_validation(capsys):
    """--allowed-rates parse errors exit 2 before any server/compile work;
    --no-param-overrides without it warns about the header-rate compile DoS
    (ADVICE r4 medium: the flag must be reachable from the deployment
    entrypoint)."""
    rc = cli_main(["serve", "--port", "0", "--allowed-rates", "8000,banana"])
    assert rc == 2 and "bad --allowed-rates" in capsys.readouterr().err
    rc = cli_main(["serve", "--port", "0", "--allowed-rates", "-1"])
    assert rc == 2 and "must be > 0" in capsys.readouterr().err
