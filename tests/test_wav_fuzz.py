"""Differential fuzz: native C++ WAV reader vs the Python RIFF walker.

The two ingest paths (voxtpu/native/wavio.cpp, voxtpu/io_wav.py) must agree
on EVERY input — accept/reject decisions and decoded samples — so a corpus
job gives identical results with or without the native loader. The reference
has one reader (`hound`); voxtpu has two and pins their equivalence instead.

Covers: well-formed files across formats (PCM 8/16/24/32, IEEE float 32/64,
extensible 24-in-32, multichannel, data-before-fmt chunk order), random
header/payload mutations, and every truncation point (interrupted
recordings decode their integral sample prefix on both paths).
"""

import os
import struct

import numpy as np
import pytest

from voxtpu import native
from voxtpu.io_wav import read_wav_bytes

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ build unavailable"
)


def _py(raw):
    try:
        w = read_wav_bytes(raw, dtype=np.float64)
        s = w.samples
        return ("ok", s[:, 0] if s.ndim > 1 else s, w.sample_rate, w.bits_per_sample)
    except Exception as e:
        return ("err", type(e).__name__)


def _nat(raw, tmp_path, i=[0]):
    p = str(tmp_path / f"f{i[0]}.wav")
    i[0] += 1
    with open(p, "wb") as f:
        f.write(raw)
    try:
        s, sr, bits = native.read_wav(p)
        return ("ok", s, sr, bits)
    except Exception as e:
        return ("err", type(e).__name__)
    finally:
        os.unlink(p)


def _check_agree(raw, tmp_path, where=""):
    a, b = _py(raw), _nat(raw, tmp_path)
    assert (a[0] == "ok") == (b[0] == "ok"), f"{where}: py={a} nat={b[:2]}"
    if a[0] == "ok":
        assert a[2] == b[2] and a[3] == b[3], f"{where}: header fields differ"
        np.testing.assert_array_equal(a[1], b[1], err_msg=where)
    return a[0] == "ok"


def _wav(code=1, ch=1, sr=8000, container=16, valid=None, n=48, seed=0,
         extensible=False, data_first=False, junk_chunk=True):
    """Assemble a WAV with full control over the header fields."""
    rng = np.random.default_rng(seed)
    valid = container if valid is None else valid
    if code == 3:
        x = rng.standard_normal(n * ch)
        payload = x.astype("<f4" if container == 32 else "<f8").tobytes()
    else:
        lo, hi = -(2 ** (valid - 1)), 2 ** (valid - 1) - 1
        vals = rng.integers(lo, hi, size=n * ch, endpoint=True) << (container - valid)
        if container == 8:
            payload = (vals + 128).astype(np.uint8).tobytes()
        elif container == 16:
            payload = vals.astype("<i2").tobytes()
        elif container == 24:
            payload = b"".join(struct.pack("<i", int(v) << 8)[1:4] for v in vals)
        else:
            payload = vals.astype("<i4").tobytes()
    block = ch * container // 8
    if extensible:
        guid_tail = bytes(
            [0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80, 0x00,
             0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        body = struct.pack(
            "<HHIIHHHHI", 0xFFFE, ch, sr, sr * block, block, container, 22,
            valid, 0
        ) + struct.pack("<H", code) + guid_tail
    else:
        body = struct.pack("<HHIIHH", code, ch, sr, sr * block, block, container)
    fmt_ck = b"fmt " + struct.pack("<I", len(body)) + body
    data_ck = b"data" + struct.pack("<I", len(payload)) + payload
    junk = b"LIST" + struct.pack("<I", 5) + b"xxxxx\x00" if junk_chunk else b""
    chunks = (data_ck + junk + fmt_ck) if data_first else (fmt_ck + junk + data_ck)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


FORMATS = [
    dict(code=1, container=8),
    dict(code=1, container=16),
    dict(code=1, container=24),
    dict(code=1, container=32),
    dict(code=1, container=16, ch=2),
    dict(code=1, container=16, ch=3, data_first=True),
    dict(code=1, container=32, valid=24, extensible=True),  # 24-in-32
    dict(code=1, container=16, extensible=True),
    dict(code=3, container=32),
    dict(code=3, container=64, ch=2),
]


@pytest.mark.parametrize("kw", FORMATS, ids=lambda k: "-".join(f"{a}{v}" for a, v in k.items()))
def test_wellformed_formats_agree(kw, tmp_path):
    raw = _wav(**kw)
    assert _check_agree(raw, tmp_path, where=str(kw)), "well-formed file rejected"


def test_mutation_fuzz_agreement(tmp_path):
    rng = np.random.default_rng(7)
    base = _wav(container=16, ch=2, n=32)
    accepted = 0
    for trial in range(400):
        raw = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            raw[int(rng.integers(0, len(raw)))] = int(rng.integers(0, 256))
        accepted += _check_agree(bytes(raw), tmp_path, where=f"mutation {trial}")
    # The fuzz must exercise both outcomes to mean anything.
    assert 0 < accepted < 400


def test_truncation_sweep_agreement(tmp_path):
    base = _wav(container=16, n=24)
    for cut in range(len(base)):
        _check_agree(base[:cut], tmp_path, where=f"cut {cut}")
    # A truncated-but-nonempty data chunk decodes its integral prefix.
    a = _py(base[: len(base) - 5])
    assert a[0] == "ok" and a[1].shape[0] == 24 - 3


def test_declared_length_past_eof(tmp_path):
    """ck_len beyond EOF (streamed/interrupted recordings): both readers
    decode the bytes that exist."""
    base = bytearray(_wav(container=16, n=24, junk_chunk=False))
    # data ck_len lives 4 bytes after the 'data' tag.
    i = bytes(base).index(b"data") + 4
    base[i : i + 4] = struct.pack("<I", 0xFFFFFF00)
    ok = _check_agree(bytes(base), tmp_path, where="ck_len past EOF")
    assert ok
    a = _py(bytes(base))
    assert a[1].shape[0] == 24


def test_zero_channels_rejected_both(tmp_path):
    base = bytearray(_wav(container=16, n=8, junk_chunk=False))
    i = bytes(base).index(b"fmt ") + 8 + 2
    base[i : i + 2] = struct.pack("<H", 0)
    a, b = _py(bytes(base)), _nat(bytes(base), tmp_path)
    assert a[0] == "err" and b[0] == "err"
