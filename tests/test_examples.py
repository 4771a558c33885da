"""Smoke tests: the bundled examples must run end-to-end and produce
sensible output (the reference ships runnable examples/, so must we)."""

import importlib.util
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_example(name):
    path = os.path.join(ROOT, "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"example_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pitch_detection_example(capsys):
    mod = _load_example("pitch_detection")
    mod.main()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("frame")]
    assert lines, out
    # "frame 0: best f0 = 150.0000 Hz (strength ...)" — a 150 Hz sine.
    f0 = float(lines[0].split("=")[1].split("Hz")[0])
    assert abs(f0 - 150.0) < 0.5, lines[0]


def test_serving_client_example(capsys):
    mod = _load_example("serving_client")
    mod.main()
    out = capsys.readouterr().out
    assert "f0 track:" in out and "server stats: " in out, out
    # short_sample's f0 sits near 100 Hz (the wav-parity fixture truth).
    track = [float(v) for v in out.split("f0 track:")[1].splitlines()[0].split()]
    voiced = [v for v in track if v > 0]
    assert voiced and all(60 <= v <= 500 for v in voiced), track


def test_formant_extraction_example(capsys):
    mod = _load_example("formant_extraction")
    rc = mod.main()
    assert rc in (0, None)
    out = capsys.readouterr().out
    rows = [l.split() for l in out.splitlines() if l and l[0].isdigit()]
    assert len(rows) > 50, f"expected gnuplot rows, got {len(rows)}"
    # Columns: time f1 f2 ... — F1 of the vowels should sit in speech range
    # at the 10 kHz analysis rate.
    f1 = np.asarray([float(r[1]) for r in rows])
    voiced = f1[f1 > 0]
    assert voiced.size > 0
    assert np.all((voiced > 50.0) & (voiced < 5001.0)), (
        voiced.min(), voiced.max())
