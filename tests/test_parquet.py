"""Parquet feature export (corpus-scale metrics, SURVEY §5)."""

import os

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")

from voxtpu.cli import main, write_features  # noqa: E402

WAV = os.path.join(os.path.dirname(__file__), "fixtures", "short_sample.wav")


def test_write_features_roundtrip(tmp_path):
    out = {
        "f0": np.array([100.0, 0.0, 220.5]),
        "formant_freqs": np.arange(12.0).reshape(3, 4),
        "status": np.array([0, 1, 0], dtype=np.int32),
        "valid": np.array([True, False, True]),
    }
    p = tmp_path / "x.parquet"
    write_features(str(p), out)
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    np.testing.assert_array_equal(np.asarray(t["f0"]), out["f0"])
    np.testing.assert_array_equal(
        np.stack(t["formant_freqs"].to_numpy(zero_copy_only=False)),
        out["formant_freqs"],
    )
    np.testing.assert_array_equal(np.asarray(t["status"]), out["status"])
    np.testing.assert_array_equal(np.asarray(t["valid"]), out["valid"].astype(np.uint8))


def test_corpus_parquet_matches_npz(tmp_path):
    o1, o2 = tmp_path / "pq", tmp_path / "npz"
    assert main(["corpus", WAV, "-o", str(o1), "--f64", "--format", "parquet",
                 "--no-resume"]) == 0
    assert main(["corpus", WAV, "-o", str(o2), "--f64", "--no-resume"]) == 0
    import pyarrow.parquet as pq

    t = pq.read_table(o1 / "short_sample.parquet")
    z = np.load(o2 / "short_sample.npz")
    np.testing.assert_allclose(np.asarray(t["f0"]), z["f0"], rtol=0)
    np.testing.assert_allclose(
        np.stack(t["mfcc"].to_numpy(zero_copy_only=False)), z["mfcc"], rtol=0
    )
    # manifest records the parquet name
    import json

    manifest = json.loads((o1 / "manifest.json").read_text())
    assert manifest[WAV]["output"].endswith(".parquet")
