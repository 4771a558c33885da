"""Parity tests for voxtpu.lpc against reference goldens (spectrum.rs tests)."""

import numpy as np
import jax.numpy as jnp

from voxtpu import errors
from voxtpu.autocorr import autocorrelate
from voxtpu.lpc import levinson, burg

from util import sine, sine_hz


def test_levinson_golden():
    # spectrum.rs:470-487 (test_lpc): sine(8) -> quirk AC -> normalize ->
    # lpc(4) == [1.0, -1.3122, 0.8660, -0.0875, -0.0103], tol 1e-4.
    x = jnp.asarray(sine(8))
    ac = autocorrelate(x, 8)
    ac = ac / jnp.max(jnp.abs(ac))
    a = np.asarray(levinson(ac, 4))
    exp = [1.0, -1.3122, 0.8660, -0.0875, -0.0103]
    np.testing.assert_allclose(a, exp, atol=1e-4)


def test_levinson_batched():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 32))
    ac = autocorrelate(jnp.asarray(x), 32, quirk=False)
    out_b = np.asarray(levinson(ac, 8))
    for i in range(6):
        out_1 = np.asarray(levinson(ac[i], 8))
        np.testing.assert_allclose(out_b[i], out_1, rtol=1e-12)


def test_burg_golden_julia():
    # spectrum.rs:512-525 (test_lpc_praat): triangle ramp 1..10,10..1,
    # order 5, golden from an independent Julia Burg implementation, tol 1e-10.
    src = np.array(list(range(1, 11)) + list(range(10, 0, -1)), dtype=np.float64)
    coeffs, status = burg(jnp.asarray(src), 5)
    exp = [
        -2.529731754197289,
        2.6138925001574935,
        -1.6951059551991234,
        0.7776548472652218,
        -0.15008712022777612,
    ]
    assert int(status) == errors.OK
    np.testing.assert_allclose(np.asarray(coeffs), exp, atol=1e-10)


def test_burg_naive_transcription():
    """Cross-check against a direct scalar transcription of spectrum.rs:101-146."""

    def burg_scalar(x, p):
        n = len(x)
        b1 = np.zeros(n)
        b2 = np.zeros(n)
        aa = np.zeros(p)
        coeffs = np.zeros(p)
        b1[0] = x[0]
        b2[n - 2] = x[n - 1]
        for j in range(2, n):
            b1[j - 1] = x[j - 1]
            b2[j - 2] = x[j - 1]
        for i in range(1, p + 1):
            num = 0.0
            denum = 0.0
            for j in range(1, n - i + 1):
                num += b1[j - 1] * b2[j - 1]
                denum += b1[j - 1] ** 2 + b2[j - 1] ** 2
            assert denum > 0
            coeffs[i - 1] = 2.0 * num / denum
            for j in range(1, i):
                coeffs[j - 1] = aa[j - 1] - coeffs[i - 1] * aa[i - j - 1]
            if i < p:
                for j in range(1, i + 1):
                    aa[j - 1] = coeffs[j - 1]
                for j in range(1, n - i):
                    b1[j - 1] = b1[j - 1] - aa[i - 1] * b2[j - 1]
                    b2[j - 1] = b2[j] - aa[i - 1] * b1[j]
        return -coeffs

    rng = np.random.default_rng(11)
    for p in (4, 13):
        x = rng.standard_normal(64)
        ref = burg_scalar(x, p)
        out, status = burg(jnp.asarray(x), p)
        assert int(status) == errors.OK
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-9, atol=1e-12)


def test_burg_sine_440():
    # spectrum.rs:489-510: 440 Hz sine @44.1 kHz, 512 samples, order 4 —
    # coefficients must be finite; downstream resonance test re-checks 4 Hz.
    x = jnp.asarray(sine_hz(440.0, 44100.0, 512))
    coeffs, status = burg(x, 4)
    assert int(status) == errors.OK
    assert np.all(np.isfinite(np.asarray(coeffs)))


def test_burg_zero_frame_flags_status():
    x = jnp.zeros((3, 32))
    coeffs, status = burg(x, 4)
    assert np.all(np.asarray(status) & errors.LPC_DENUM_NONPOS)
    assert np.all(np.isfinite(np.asarray(coeffs)))


def test_burg_batched_matches_single():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 128))
    out_b, st_b = burg(jnp.asarray(x), 10)
    for i in range(4):
        out_1, st_1 = burg(jnp.asarray(x[i]), 10)
        np.testing.assert_allclose(np.asarray(out_b)[i], np.asarray(out_1), rtol=1e-12)


def test_lpc_solver_wrapper():
    from voxtpu.lpc import LPCSolver

    x = jnp.asarray(sine(8))
    ac = autocorrelate(x, 8)
    ac = ac / jnp.max(jnp.abs(ac))
    solver = LPCSolver(4)
    solver.solve(ac)
    np.testing.assert_allclose(
        np.asarray(solver.lpc()), np.asarray(levinson(ac, 4)), rtol=1e-12
    )
