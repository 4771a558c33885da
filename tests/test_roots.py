"""Parity tests for voxtpu.roots against reference goldens (polynomial.rs tests)."""

import numpy as np
import jax.numpy as jnp

from voxtpu import errors
from voxtpu.cplx import C
from voxtpu.roots import degree, off_low, laguerre, find_roots


def cpoly(vals, dtype=np.float64):
    re = jnp.asarray(np.asarray([complex(v).real for v in vals], dtype=dtype))
    im = jnp.asarray(np.asarray([complex(v).imag for v in vals], dtype=dtype))
    return C(re, im)


def roots_as_complex(r: C, count: int) -> np.ndarray:
    return (np.asarray(r.re) + 1j * np.asarray(r.im))[:count]


def test_degree():
    # polynomial.rs:269-273
    c = cpoly([3.0, 2.0, 4.0, 0.0, 0.0])
    assert int(degree(c)) == 2


def test_off_low():
    # polynomial.rs:275-279
    c = cpoly([0.0, 0.0, 3.0, 2.0, 4.0])
    assert int(off_low(c)) == 2


def test_laguerre_golden():
    # polynomial.rs:281-292: degree-3 poly from (-64,-64) ->
    # (-0.1070229535872, -0.8514680262155), tol 1e-8.
    c = cpoly([1.0, 2.5, 2.0, 3.0])
    z = laguerre(c, C(jnp.asarray(-64.0), jnp.asarray(-64.0)))
    assert abs(float(z.re) - (-0.1070229535872)) < 1e-8
    assert abs(float(z.im) - (-0.8514680262155)) < 1e-8


def test_laguerre_f32_finite():
    # polynomial.rs:379-386: order-10 LPC-like poly stays finite in f32.
    vals = [1.0, -0.99640256, 0.25383306, -0.25471634, 0.5084799, -0.0685858,
            -0.35042483, 0.07676613, -0.12874511, 0.11829436, 0.023972526]
    c = cpoly(vals, dtype=np.float32)
    z = laguerre(c, C(jnp.asarray(np.float32(-64.0)), jnp.asarray(np.float32(-64.0))))
    assert np.isfinite(float(z.re))
    assert np.isfinite(float(z.im))


def test_1d_roots():
    # polynomial.rs:294-305
    r, count, status = find_roots(cpoly([1.0, 2.5]))
    assert int(status) == 0
    assert int(count) == 1
    got = roots_as_complex(r, 1)
    np.testing.assert_allclose(got, [-0.4 + 0j], atol=1e-12)


def test_2d_roots():
    # polynomial.rs:307-319
    r, count, status = find_roots(cpoly([1.0, 2.5, -2.0]))
    assert int(count) == 2
    got = roots_as_complex(r, 2)
    exp = [-0.31872930440884, 1.5687293044088]
    np.testing.assert_allclose(got.real, exp, atol=1e-12)
    np.testing.assert_allclose(got.imag, [0, 0], atol=1e-12)


def test_2d_complex_roots():
    # polynomial.rs:321-333
    r, count, status = find_roots(cpoly([1.0, -2.5, 2.0]))
    got = roots_as_complex(r, 2)
    exp = [0.625 - 0.33071891388307j, 0.625 + 0.33071891388307j]
    np.testing.assert_allclose(got, exp, atol=1e-12)


def test_2d_complex_roots_f32():
    # polynomial.rs:335-347 (tolerance in the rust test is 1e-12 on f32,
    # which only holds because values are exactly representable-ish; we use
    # the f32-realistic 1e-6).
    r, count, status = find_roots(cpoly([1.0, -2.5, 2.0], dtype=np.float32))
    got = roots_as_complex(r, 2)
    exp = [0.625 - 0.33071891388307j, 0.625 + 0.33071891388307j]
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_hi_d_roots():
    # polynomial.rs:349-362: cubic, tol 1e-6.
    r, count, status = find_roots(cpoly([1.0, 2.5, -2.0, -3.0]))
    assert int(count) == 3
    got = roots_as_complex(r, 3)
    exp = [-1.1409835232292, -0.35308705904629, 0.82740391560878]
    np.testing.assert_allclose(got.real, exp, atol=1e-6)
    np.testing.assert_allclose(got.imag, [0, 0, 0], atol=1e-6)


def test_leading_zero_coeffs_give_zero_roots():
    # polynomial.rs:103-106: off_low leading zeros -> zero roots first.
    r, count, status = find_roots(cpoly([0.0, 1.0, 2.5]))
    assert int(count) == 2
    got = roots_as_complex(r, 2)
    np.testing.assert_allclose(got, [0.0, -0.4], atol=1e-12)


def test_zero_degree_flags_status():
    r, count, status = find_roots(cpoly([3.0, 0.0, 0.0]))
    assert int(status) & errors.POLY_ZERO_DEGREE


def test_batched_matches_single():
    polys = [
        [1.0, 2.5, -2.0, -3.0],
        [1.0, -2.5, 2.0, 0.0],
        [1.0, 2.5, 0.0, 0.0],
        [0.2, -1.3, 0.7, 2.1],
    ]
    c = C(
        jnp.asarray(np.array(polys, dtype=np.float64)),
        jnp.zeros((4, 4), dtype=jnp.float64),
    )
    rb, cb, sb = find_roots(c)
    for i, p in enumerate(polys):
        r1, c1_, s1 = find_roots(cpoly(p))
        np.testing.assert_allclose(np.asarray(rb.re)[i], np.asarray(r1.re), atol=1e-12)
        np.testing.assert_allclose(np.asarray(rb.im)[i], np.asarray(r1.im), atol=1e-12)
        assert int(cb[i]) == int(c1_)


def test_roots_against_numpy_random_monic():
    """High-degree sanity: compare root *sets* against numpy.roots."""
    rng = np.random.default_rng(5)
    for order in (8, 13):
        coeffs = rng.standard_normal(order + 1) * 0.5
        coeffs[-1] = 1.0  # monic, like the LPC polynomial (lib.rs:76-91)
        r, count, status = find_roots(cpoly(list(coeffs)))
        assert int(status) == 0
        got = roots_as_complex(r, int(count))
        exp = np.roots(coeffs[::-1])
        # Compare as sets (order differs): optimal assignment by distance.
        from scipy.optimize import linear_sum_assignment

        cost = np.abs(got[:, None] - exp[None, :])
        ri, ci = linear_sum_assignment(cost)
        assert cost[ri, ci].max() < 1e-6


def test_div_polynomial():
    from voxtpu.roots import div_polynomial

    # (x^2 + 2.5x - 2) / (x + 2.5): quotient x, remainder p(-2.5)... use
    # numpy polynomial division as the oracle.
    c = cpoly([-2.0, 2.5, 1.0])
    q, rem = div_polynomial(c, C(jnp.asarray(2.5), jnp.asarray(0.0)))
    qn, rn = np.polydiv([1.0, 2.5, -2.0], [1.0, 2.5])
    got_q = np.asarray(q.re)
    np.testing.assert_allclose(got_q[:2], qn[::-1], atol=1e-12)
    assert abs(float(got_q[2])) < 1e-12  # top zeroed
    np.testing.assert_allclose(float(np.asarray(rem.re)[0]), rn[-1], atol=1e-12)


def test_find_roots_pallas_matches_jnp():
    """Pallas roots kernel (voxtpu/ops/roots_pallas.py, interpret mode) ==
    the jnp twin across normal, lower-degree, off_low>0, and zero-degree
    rows. The kernel's algebraic complex sqrt (Mosaic has no atan2) differs
    from the polar form at ulp level only."""
    from voxtpu.ops.roots_pallas import find_roots_pallas

    rng = np.random.default_rng(5)
    B, N = 37, 14
    cre = rng.standard_normal((B, N))
    cim = rng.standard_normal((B, N)) * 0.3
    cre[:, N - 1] = 1.0
    cim[:, N - 1] = 0.0
    cre[3] = 0.0
    cim[3] = 0.0  # zero polynomial -> POLY_ZERO_DEGREE
    cre[7, 10:] = 0.0
    cim[7, 10:] = 0.0  # lower degree
    cre[11, :2] = 0.0
    cim[11, :2] = 0.0  # off_low > 0 -> leading zero roots

    roots, count, status = find_roots(
        C(jnp.asarray(cre), jnp.asarray(cim)), backend="jnp"
    )
    rre, rim, cnt2, st2 = find_roots_pallas(
        jnp.asarray(cre), jnp.asarray(cim), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(count), np.asarray(cnt2))
    np.testing.assert_array_equal(np.asarray(status), np.asarray(st2))
    np.testing.assert_allclose(np.asarray(rre), np.asarray(roots.re),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rim), np.asarray(roots.im),
                               rtol=0, atol=1e-12)


def test_find_roots_backend_dispatch_lpc_golden():
    """The pallas_interpret backend reproduces the LPC-shaped golden root set
    through the public find_roots entry (production dispatch path)."""
    # order-10 LPC-like real polynomial: roots must satisfy p(z) ~ 0
    rng = np.random.default_rng(12)
    B, N = 5, 11
    cre = rng.standard_normal((B, N)) * 0.4
    cre[:, N - 1] = 1.0
    cim = np.zeros((B, N))
    roots, count, status = find_roots(
        C(jnp.asarray(cre), jnp.asarray(cim)), backend="pallas_interpret"
    )
    assert np.all(np.asarray(status) == 0)
    assert np.all(np.asarray(count) == N - 1)
    # cross-check the root set against numpy.roots (deflation accumulates
    # error into the tail roots — the reference does no polishing, so a raw
    # residual check is the wrong bar; set-match is the meaningful one)
    rr = np.asarray(roots.re) + 1j * np.asarray(roots.im)
    for b in range(B):
        exp = np.roots(cre[b][::-1])
        got = rr[b][: N - 1]  # zeros past count are padding
        # set match (sort_complex misaligns conjugate pairs on ulp-level
        # real-part ties): every root within 1e-4 of a numpy root and v.v.
        d = np.abs(got[:, None] - exp[None, :])
        assert d.min(axis=1).max() < 1e-4, d.min(axis=1).max()
        assert d.min(axis=0).max() < 1e-4, d.min(axis=0).max()


def test_polish_roots_recovers_accuracy_and_guards():
    """Compensated-Newton polish (roots.polish_roots, VERDICT r4 #4):
    perturbed f32 roots of a known polynomial converge back to the true
    roots; zero slots stay untouched; the |p| safeguard never lets a
    pathological step regress below the input root."""
    import numpy as np
    import jax.numpy as jnp

    from voxtpu.cplx import C
    from voxtpu.roots import polish_roots

    rng = np.random.default_rng(4)
    true = np.array([0.81 + 0.55j, 0.81 - 0.55j, -0.42 + 0.87j, -0.42 - 0.87j,
                     0.30 + 0.92j, 0.30 - 0.92j], dtype=np.complex128)
    coeffs64 = np.poly(true)[::-1]  # index = power
    # Pad to a fixed workspace with zero top coefficients + two zero slots.
    N = len(coeffs64) + 2
    cre = np.zeros((1, N), np.float32)
    cim = np.zeros((1, N), np.float32)
    cre[0, : len(coeffs64)] = coeffs64.real.astype(np.float32)
    cim[0, : len(coeffs64)] = coeffs64.imag.astype(np.float32)

    z = true + (3e-4 * (rng.standard_normal(6) + 1j * rng.standard_normal(6)))
    zre = np.zeros((1, N), np.float32)
    zim = np.zeros((1, N), np.float32)
    zre[0, :6] = z.real.astype(np.float32)
    zim[0, :6] = z.imag.astype(np.float32)

    out = polish_roots(C(jnp.asarray(cre), jnp.asarray(cim)),
                       C(jnp.asarray(zre), jnp.asarray(zim)))
    got = np.asarray(out.re)[0, :6] + 1j * np.asarray(out.im)[0, :6]
    err_in = np.abs(z - true).max()
    err_out = np.abs(got - true).max()
    assert err_out < err_in / 20, (err_in, err_out)
    assert err_out < 5e-6, err_out
    # zero slots untouched
    assert np.all(np.asarray(out.re)[0, 6:] == 0)
    assert np.all(np.asarray(out.im)[0, 6:] == 0)

    # Safeguard: starting from garbage far outside the step bound, the
    # result is never WORSE in residual than the input.
    bad_re = zre.copy()
    bad_re[0, 0] = 50.0  # |p| astronomically large; Newton step is huge
    bad = polish_roots(C(jnp.asarray(cre), jnp.asarray(cim)),
                       C(jnp.asarray(bad_re), jnp.asarray(zim)))

    def presid(rr, ri):
        zs = rr + 1j * ri
        return abs(np.polyval(coeffs64[::-1], zs))

    assert presid(float(np.asarray(bad.re)[0, 0]),
                  float(np.asarray(bad.im)[0, 0])) <= presid(50.0, float(zim[0, 0])) + 1e-6


def test_polish_is_noop_in_f64_formant_path():
    """f64 parity mode never polishes: formant_candidates(polish=True) ==
    (polish=False) bit-for-bit in float64 (quirk-exact semantics hold)."""
    import numpy as np
    import jax.numpy as jnp

    from voxtpu.formants import formant_candidates

    rng = np.random.default_rng(11)
    t = np.arange(1024) / 11025.0
    x = np.sin(2 * np.pi * 120 * t) + 0.2 * np.sin(2 * np.pi * 900 * t)
    frames = jnp.asarray((x + 0.01 * rng.standard_normal(t.shape))[None, :],
                         jnp.float64)
    a = formant_candidates(frames, 11025.0, 10, polish=True)
    b = formant_candidates(frames, 11025.0, 10, polish=False)
    for x_, y_ in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x_), np.asarray(y_))
