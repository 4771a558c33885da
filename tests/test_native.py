"""Native C++ loader parity vs the Python path."""

import os

import numpy as np
import pytest

from voxtpu import native
from voxtpu.io_wav import read_wav

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_wav_matches_python():
    for name in ("short_sample.wav", "down_sampled.wav", "sample-two_vowels.wav"):
        path = os.path.join(FIXTURES, name)
        py = read_wav(path)
        nat, sr, bits = native.read_wav(path)
        assert sr == py.sample_rate
        assert bits == py.bits_per_sample
        np.testing.assert_allclose(nat, py.samples, rtol=0, atol=0)


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_frame_matches_python():
    import jax.numpy as jnp
    from voxtpu.frame import frame_signal

    rng = np.random.default_rng(0)
    x = rng.standard_normal(5000)
    nat = native.frame(x, 512, 256)
    py = np.asarray(frame_signal(jnp.asarray(x), 512, 256))
    np.testing.assert_array_equal(nat, py)

    x32 = x.astype(np.float32)
    nat32 = native.frame(x32, 512, 256)
    assert nat32.dtype == np.float32
    np.testing.assert_array_equal(nat32, x32[np.arange(18)[:, None] * 256 + np.arange(512)])


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_24bit_and_stereo(tmp_path):
    import struct
    import wave as wave_mod

    p = tmp_path / "n24.wav"
    vals = [2**23 - 1, -(2**23 - 1), 4096, -1]
    with wave_mod.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(b"".join(struct.pack("<i", v << 8)[1:4] for v in vals))
    nat, sr, bits = native.read_wav(str(p))
    assert (sr, bits) == (16000, 24)
    py = read_wav(str(p))
    np.testing.assert_allclose(nat, py.samples, atol=0)

    p2 = tmp_path / "st.wav"
    with wave_mod.open(str(p2), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"".join(struct.pack("<hh", i * 7, -i * 7) for i in range(16)))
    ch0, _, _ = native.read_wav(str(p2), channel=0)
    ch1, _, _ = native.read_wav(str(p2), channel=1)
    np.testing.assert_allclose(ch0, np.arange(16) * 7 / 32767)
    np.testing.assert_allclose(ch1, -np.arange(16) * 7 / 32767)
