"""Parity tests for voxtpu.waves against reference goldens (waves.rs tests)."""

import numpy as np
import jax.numpy as jnp

from voxtpu import waves
from voxtpu.windows import hann, hanning_lag
from voxtpu.autocorr import autocorrelate

from util import sine


def test_rms_sine():
    # waves.rs:138-144: RMS of a 64-sample unit sine ~ 0.707, tol 1e-3.
    out = waves.rms(jnp.asarray(sine(64)))
    assert abs(float(out) - 0.707) < 1e-3


def test_rms_batched():
    x = np.stack([sine(64), 2.0 * sine(64)])
    out = np.asarray(waves.rms(jnp.asarray(x)))
    assert abs(out[0] - 0.707) < 1e-3
    assert abs(out[1] - 2 * 0.7071) < 1e-3


def test_max_amplitude():
    x = jnp.asarray([0.1, -0.9, 0.5])
    assert float(waves.max_amplitude(x)) == 0.9


def test_normalize():
    x = jnp.asarray([0.1, -0.5, 0.25])
    out = np.asarray(waves.normalize(x))
    np.testing.assert_allclose(out, [0.2, -1.0, 0.5], rtol=1e-12)


def test_normalize_with_given_max():
    # normalize_with_max(Some(max)) divides by the provided value as-is
    # (waves.rs:68-76).
    x = jnp.asarray([0.1, -0.5, 0.25])
    out = np.asarray(waves.normalize(x, max_amp=0.5))
    np.testing.assert_allclose(out, [0.2, -1.0, 0.5], rtol=1e-12)


def test_preemphasis_exact_recurrence():
    # waves.rs:86-96: y[i] = x[i] + 2*pi*factor*y[i+1], backwards, sequential.
    rng = np.random.default_rng(0)
    x = rng.standard_normal(37)
    factor = 0.01
    c = 2.0 * np.pi * factor
    ref = x.copy()
    last = ref[-1]
    for i in range(len(ref) - 2, -1, -1):
        ref[i] = ref[i] + last * c
        last = ref[i]
    out = np.asarray(waves.preemphasis(jnp.asarray(x), factor))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_preemphasis_batched_matches_single():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 32))
    out_b = np.asarray(waves.preemphasis(jnp.asarray(x), 0.1))
    for i in range(4):
        out_1 = np.asarray(waves.preemphasis(jnp.asarray(x[i]), 0.1))
        np.testing.assert_allclose(out_b[i], out_1, rtol=1e-12)


def test_window_autocorr_matches_hanning_lag():
    # waves.rs:120-136: AC of the Hann window (normalized) matches the
    # analytic HanningLag window within 1e-1.
    w = hann(16)
    ac = np.asarray(autocorrelate(jnp.asarray(w), 16))
    ac = ac / np.max(np.abs(ac))
    lag = hanning_lag(16)
    np.testing.assert_allclose(ac, lag, atol=1e-1)
