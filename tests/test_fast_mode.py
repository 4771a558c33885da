"""float32 fast-mode accuracy vs float64 parity mode.

The TPU runs float32 (no f64 hardware); parity tests run f64 on CPU. This
characterizes the fast-mode error budget on real speech so regressions in
f32 numerics are caught without a chip.
"""

import os

import numpy as np
import jax.numpy as jnp

from voxtpu.io_wav import read_wav
from voxtpu.frame import frame_signal
from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze_frames,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_f32_matches_f64_within_budget():
    wav = read_wav(os.path.join(FIX, "short_sample.wav"))
    sr = float(wav.sample_rate)
    cfg = AnalysisConfig(
        sr, 512, 256,
        PitchConfig(fmin=60.0, fmax=500.0, max_candidates=16),
        FormantConfig(n_coeffs=10),
        MfccConfig(num_coeffs=13, freq_hi=5000.0),
    )
    f64 = analyze_frames(frame_signal(jnp.asarray(wav.samples), 512, 256), cfg)
    f32 = analyze_frames(
        frame_signal(jnp.asarray(wav.samples, dtype=jnp.float32), 512, 256), cfg
    )

    # f0: < 0.5 Hz absolute on voiced speech (~100 Hz here)
    np.testing.assert_allclose(
        np.asarray(f32["f0"]), np.asarray(f64["f0"]), atol=0.5
    )
    # formants: < 15 Hz absolute (roots of an order-10 polynomial in f32)
    np.testing.assert_allclose(
        np.asarray(f32["formant_freqs"]), np.asarray(f64["formant_freqs"]), atol=15.0
    )
    # MFCC: < 2e-2 absolute
    np.testing.assert_allclose(
        np.asarray(f32["mfcc"]), np.asarray(f64["mfcc"]), atol=2e-2
    )
    # RMS: tight
    np.testing.assert_allclose(
        np.asarray(f32["rms"]), np.asarray(f64["rms"]), rtol=1e-5
    )
    assert np.all(np.asarray(f32["status"]) == 0)
