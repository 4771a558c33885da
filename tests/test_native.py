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


# --- format-hardening fixtures (VERDICT r2 #6) -------------------------------

_GUID_TAIL = bytes([0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
                    0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])


def _riff(fmt_chunk: bytes, payload: bytes) -> bytes:
    import struct

    body = (b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _fmt_plain(code, ch, sr, container_bits):
    import struct

    block = ch * container_bits // 8
    return struct.pack("<HHIIHH", code, ch, sr, sr * block, block, container_bits)


def _fmt_extensible(sub_code, ch, sr, container_bits, valid_bits,
                    guid_tail=_GUID_TAIL):
    import struct

    block = ch * container_bits // 8
    return (struct.pack("<HHIIHH", 0xFFFE, ch, sr, sr * block, block, container_bits)
            + struct.pack("<HHI", 22, valid_bits, 0)
            + struct.pack("<H", sub_code) + guid_tail)


def test_extensible_24in32_scaling(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE, 24 valid bits left-justified in a 32-bit
    container: must decode at the 24-bit scale (a container-width decode is
    silently wrong by 256x) and bit-match the same values in a plain 24-bit
    file."""
    import struct
    import wave as wave_mod

    vals = [2**23 - 1, -(2**23 - 1), 4096, -1, 0, -2**23]
    ext = tmp_path / "ext2432.wav"
    payload = b"".join(struct.pack("<i", v << 8) for v in vals)
    ext.write_bytes(_riff(_fmt_extensible(1, 1, 16000, 32, 24), payload))

    py = read_wav(str(ext))
    assert py.bits_per_sample == 24
    scale = (2**31 - 1) >> 8
    np.testing.assert_array_equal(py.samples, np.asarray(vals) / scale)

    plain = tmp_path / "plain24.wav"
    with wave_mod.open(str(plain), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(16000)
        w.writeframes(b"".join(struct.pack("<i", v << 8)[1:4] for v in vals))
    np.testing.assert_array_equal(py.samples, read_wav(str(plain)).samples)

    if native.available():
        nat, sr, bits = native.read_wav(str(ext))
        assert (sr, bits) == (16000, 24)
        np.testing.assert_array_equal(nat, py.samples)


def test_ieee_float_wavs(tmp_path):
    """WAVE_FORMAT_IEEE_FLOAT (format 3): f32 and f64 payloads decode as-is,
    both plain and wrapped in EXTENSIBLE."""
    import struct

    vals = [0.0, 1.0, -1.0, 0.25, -0.3330078125]
    f32 = tmp_path / "f32.wav"
    f32.write_bytes(_riff(_fmt_plain(3, 1, 22050, 32),
                          struct.pack(f"<{len(vals)}f", *vals)))
    py = read_wav(str(f32))
    assert py.sample_rate == 22050 and py.bits_per_sample == 32
    np.testing.assert_array_equal(py.samples, np.asarray(vals, np.float32))

    f64 = tmp_path / "f64.wav"
    f64.write_bytes(_riff(_fmt_plain(3, 1, 8000, 64),
                          struct.pack(f"<{len(vals)}d", *vals)))
    py64 = read_wav(str(f64))
    assert py64.bits_per_sample == 64
    np.testing.assert_array_equal(py64.samples, np.asarray(vals))

    extf = tmp_path / "extf32.wav"
    extf.write_bytes(_riff(_fmt_extensible(3, 1, 22050, 32, 32),
                           struct.pack(f"<{len(vals)}f", *vals)))
    np.testing.assert_array_equal(read_wav(str(extf)).samples,
                                  np.asarray(vals, np.float32))

    if native.available():
        for p, expect in ((f32, np.asarray(vals, np.float32)),
                          (f64, np.asarray(vals)),
                          (extf, np.asarray(vals, np.float32))):
            nat, _, _ = native.read_wav(str(p))
            np.testing.assert_array_equal(nat, expect)


def test_bad_formats_fail_loudly(tmp_path):
    """Unknown SubFormat GUIDs / format codes / float widths must raise, not
    decode garbage (the old reader accepted 0xFFFE and read it as plain PCM)."""
    import struct

    import pytest

    vals = struct.pack("<4h", 1, 2, 3, 4)
    badguid = tmp_path / "badguid.wav"
    tail = bytes([0xDE] * 14)
    badguid.write_bytes(
        _riff(_fmt_extensible(1, 1, 8000, 16, 16, guid_tail=tail), vals))
    with pytest.raises(ValueError):
        read_wav(str(badguid))

    alaw = tmp_path / "alaw.wav"
    alaw.write_bytes(_riff(_fmt_plain(6, 1, 8000, 8), bytes(8)))
    with pytest.raises(ValueError):
        read_wav(str(alaw))

    f16 = tmp_path / "f16.wav"
    f16.write_bytes(_riff(_fmt_plain(3, 1, 8000, 16), bytes(8)))
    with pytest.raises(ValueError):
        read_wav(str(f16))

    if native.available():
        for p in (badguid, alaw, f16):
            with pytest.raises(IOError):
                native.read_wav(str(p))


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_read_channel_bounds_and_channels_return():
    path = os.path.join(FIXTURES, "short_sample.wav")
    samples, sr, bits, n_ch = native.read_wav(path, return_channels=True)
    assert n_ch == 1 and sr == 11025
    with pytest.raises(IndexError):
        native.read_wav(path, channel=1)
    with pytest.raises(IndexError):
        native.read_wav(path, channel=-1)


def test_cli_read_rejects_negative_channel(tmp_path):
    from voxtpu.cli import _read

    path = os.path.join(FIXTURES, "short_sample.wav")
    with pytest.raises(IndexError, match="non-negative"):
        _read(path, np.float64, channel="-1")


def test_probe_wav_rate_headers(tmp_path):
    """probe_wav_rate exists precisely for headers stdlib `wave` mishandles
    (IEEE float, EXTENSIBLE) and must walk leading non-fmt chunks; errors on
    non-RIFF and fmt-less files (ADVICE r4 coverage)."""
    import struct

    from voxtpu.io_wav import probe_wav_rate

    f = tmp_path / "f32.wav"
    f.write_bytes(_riff(_fmt_plain(3, 1, 22050, 32), struct.pack("<f", 0.5)))
    assert probe_wav_rate(str(f)) == 22050.0

    e = tmp_path / "ext.wav"
    e.write_bytes(_riff(_fmt_extensible(1, 2, 48000, 32, 24), b"\0" * 8))
    assert probe_wav_rate(str(e)) == 48000.0

    # fmt chunk not first: the probe seeks chunk to chunk.
    raw = _riff(_fmt_plain(1, 1, 11025, 16), b"\0\0")
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    reordered = raw[:12] + lst + raw[12:]
    reordered = b"RIFF" + struct.pack("<I", len(reordered) - 8) + reordered[8:]
    g = tmp_path / "list.wav"
    g.write_bytes(reordered)
    assert probe_wav_rate(str(g)) == 11025.0

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not a wav")
    with pytest.raises(ValueError, match="RIFF"):
        probe_wav_rate(str(bad))
    nofmt = tmp_path / "nofmt.wav"
    nofmt.write_bytes(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(ValueError, match="missing fmt"):
        probe_wav_rate(str(nofmt))
