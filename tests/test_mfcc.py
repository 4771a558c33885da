"""Parity tests for voxtpu.mfcc (reference spectrum.rs MFCC/DCT)."""

import numpy as np
import jax.numpy as jnp


from voxtpu.windows import hann
from voxtpu.mfcc import hz_to_mel, mel_to_hz, dct, mfcc

import reference_impl as ref


def test_hz_mel_golden():
    # spectrum.rs:569-577
    assert abs(hz_to_mel(300.0) - 401.25) < 1e-2
    assert abs(mel_to_hz(401.25) - 300.0) < 1e-2


def test_dct_golden():
    # spectrum.rs:604-613
    out = np.asarray(dct(jnp.asarray([0.2, 0.3, 0.4, 0.3])))
    exp = [2.4, -0.26131, -0.28284, 0.10823]
    np.testing.assert_allclose(out, exp, atol=1e-5)


def test_mfcc_not_nan_on_zero():
    # spectrum.rs:592-602
    out = np.asarray(mfcc(jnp.zeros(512), 13, (100.0, 8000.0), 22050.0))
    assert np.all(np.isfinite(out))


def test_mfcc_parity_random_noise():
    # spectrum.rs:579-590 driver shape: preemphasized Hann-windowed noise,
    # 256 samples, 26 coeffs, bounds (133, 6855), sr 22050. The reference test
    # preemphasizes with factor 0.1*22050 (a reference bug that explodes the
    # recurrence); use a sane factor here and test the quirky one separately.
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, 256)
    x = ref.preemphasis(x, 50.0 / 22050.0)
    x = x * ref.hanning(256)

    exp = ref.mfcc(x, 26, (133.0, 6855.0), 22050.0)
    got = np.asarray(mfcc(jnp.asarray(x), 26, (133.0, 6855.0), 22050.0))
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_mfcc_parity_speech_frames():
    import os
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal

    wav = read_wav(os.path.join(os.path.dirname(__file__), "fixtures", "short_sample.wav"))
    frames = np.asarray(frame_signal(jnp.asarray(wav.samples), 512, 256, window="hanning"))
    got = np.asarray(mfcc(jnp.asarray(frames), 13, (100.0, 5000.0), float(wav.sample_rate)))
    for i in range(frames.shape[0]):
        exp = ref.mfcc(frames[i], 13, (100.0, 5000.0), float(wav.sample_rate))
        np.testing.assert_allclose(got[i], exp, rtol=1e-8, atol=1e-9)


def test_mfcc_batched_matches_single():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 128))
    out_b = np.asarray(mfcc(jnp.asarray(x), 13, (100.0, 4000.0), 11025.0))
    for i in range(4):
        out_1 = np.asarray(mfcc(jnp.asarray(x[i]), 13, (100.0, 4000.0), 11025.0))
        np.testing.assert_allclose(out_b[i], out_1, rtol=1e-12)


def test_mfcc_corrected_mode_differs_but_finite():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(256)
    out = np.asarray(mfcc(jnp.asarray(x), 13, (100.0, 8000.0), 22050.0, exact=False))
    assert np.all(np.isfinite(out))
