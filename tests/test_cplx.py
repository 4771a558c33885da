"""Parity tests for voxtpu.cplx (reference complex.rs tests)."""

import numpy as np
import jax.numpy as jnp

from voxtpu.cplx import C, csqrt, cmul, cdiv, cinv, cconj, cnorm


def test_square_root_golden():
    # complex.rs:50-64: sqrt(2 - 3i) ~ 1.6741492280355 - 0.89597747612984i
    z = C(jnp.asarray(2.0), jnp.asarray(-3.0))
    r = csqrt(z)
    assert abs(float(r.re) - 1.6741492280355) < 1e-6
    assert abs(float(r.im) - (-0.89597747612984)) < 1e-6
    sq = cmul(r, r)
    assert abs(float(sq.re) - 2.0) < 1e-6
    assert abs(float(sq.im) - (-3.0)) < 1e-6


def test_negative_real_sqrt():
    # complex.rs:66-74: sqrt(-9) = 3i
    r = csqrt(C(jnp.asarray(-9.0), jnp.asarray(0.0)))
    assert abs(float(r.re)) < 1e-12
    assert abs(float(r.im) - 3.0) < 1e-12


def test_ops_match_python_complex():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    b = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    ca = C(jnp.asarray(a.real), jnp.asarray(a.imag))
    cb = C(jnp.asarray(b.real), jnp.asarray(b.imag))

    def as_np(c):
        return np.asarray(c.re) + 1j * np.asarray(c.im)

    np.testing.assert_allclose(as_np(cmul(ca, cb)), a * b, rtol=1e-12)
    np.testing.assert_allclose(as_np(cdiv(ca, cb)), a / b, rtol=1e-12)
    np.testing.assert_allclose(as_np(cinv(ca)), 1 / a, rtol=1e-12)
    np.testing.assert_allclose(as_np(cconj(ca)), np.conj(a), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cnorm(ca)), np.abs(a), rtol=1e-12)
