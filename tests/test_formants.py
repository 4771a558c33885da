"""Parity tests for resonances + McCandless formant tracking."""

import numpy as np
import jax.numpy as jnp

from voxtpu.cplx import C
from voxtpu.lpc import burg
from voxtpu.roots import find_roots
from voxtpu.resonance import resonances_from_roots, sort_and_pack_resonances
from voxtpu.formants import (
    estimate_formants_step,
    formant_tracker,
    find_formants,
    resample_linear,
)

from util import sine_hz


def test_resonances_golden():
    # spectrum.rs:461-468: conjugate pair on the unit circle at 120 deg,
    # sr=300 -> freq 100, bw 0.
    roots = C(
        jnp.asarray([-0.5, -0.5]),
        jnp.asarray([0.86602540378444, -0.86602540378444]),
    )
    freq, bw, valid = resonances_from_roots(roots, 300.0, require_im_positive=False)
    freq_s, bw_s = sort_and_pack_resonances(freq, bw, valid, 4)
    assert abs(float(freq_s[0]) - 100.0) < 1e-8
    assert abs(float(bw_s[0]) - 0.0) < 1e-8


def test_root_reflection():
    # |z| > 1 roots reflect inside the unit circle (spectrum.rs:170-173):
    # conj(z)^-1 has magnitude 1/r, same angle.
    z = 1.25 * np.exp(1j * 0.8)
    roots = C(jnp.asarray([z.real]), jnp.asarray([z.imag]))
    freq, bw, valid = resonances_from_roots(roots, 8000.0, require_im_positive=False)
    exp_freq = 0.8 * 8000.0 / (2 * np.pi)
    exp_bw = -2.0 * np.log(1 / 1.25) * 8000.0 / (2 * np.pi)
    assert abs(float(freq[0]) - exp_freq) < 1e-8
    assert abs(float(bw[0]) - exp_bw) < 1e-6


def test_sine_resonance_440():
    # spectrum.rs:489-510: 440 Hz sine @44.1kHz, Burg order 4 -> a resonance
    # within 4 Hz of 440.
    x = jnp.asarray(sine_hz(440.0, 44100.0, 512))
    coeffs, status = burg(x, 4)
    assert int(status) == 0
    poly_re = jnp.concatenate([coeffs[::-1], jnp.ones(1)], axis=-1)
    roots, count, rstat = find_roots(C(poly_re, jnp.zeros_like(poly_re)))
    assert int(rstat) == 0
    freq, bw, valid = resonances_from_roots(roots, 44100.0, require_im_positive=True)
    freqs = np.asarray(freq)[np.asarray(valid)]
    assert any(abs(f - 440.0) < 4.0 for f in freqs)


def test_resonances_from_coeffs_golden():
    # spectrum.rs:615-633: known Burg coefficients -> formant frequencies
    # within 1 Hz of Praat-derived goldens at sr=11025.
    coeffs = jnp.asarray(
        [-0.80098309, 1.20869679, -1.61846677, 0.86630291,
         -1.44203292, 0.93621726, -0.58772811, 0.65949051]
    )
    poly_re = jnp.concatenate([coeffs[::-1], jnp.ones(1)], axis=-1)
    roots, count, rstat = find_roots(C(poly_re, jnp.zeros_like(poly_re)))
    freq, bw, valid = resonances_from_roots(roots, 11025.0, require_im_positive=False)
    got = np.sort(np.asarray(freq)[np.asarray(valid) & (np.asarray(roots.im) > 0)])
    exp = [251.770, 2289.634, 3037.846, 4045.196]
    assert len(got) >= len(exp)
    for g, e in zip(got, exp):
        assert abs(g - e) < 1.0, (got, exp)


def test_formant_extractor_golden_trajectory():
    # spectrum.rs:528-567: the exact 3-frame golden path.
    resonances = np.array(
        [
            [100.0, 150.0, 200.0, 240.0, 300.0],
            [110.0, 180.0, 210.0, 230.0, 310.0],
            [230.0, 270.0, 290.0, 350.0, 360.0],
        ]
    )
    res_bw = np.ones_like(resonances)
    est = jnp.asarray([140.0, 230.0, 320.0])
    est_bw = jnp.ones(3)
    freqs, bws = formant_tracker(jnp.asarray(resonances), jnp.asarray(res_bw), est, est_bw)
    freqs = np.asarray(freqs)
    np.testing.assert_allclose(freqs[0], [150.0, 240.0, 300.0])
    np.testing.assert_allclose(freqs[1], [180.0, 230.0, 310.0])
    np.testing.assert_allclose(freqs[2], [230.0, 270.0, 290.0])


def test_estimate_step_batched_matches_single():
    rng = np.random.default_rng(0)
    res = np.abs(rng.standard_normal((8, 32))) * 2000 + 100
    rbw = np.abs(rng.standard_normal((8, 32))) * 50
    est = np.asarray([320.0, 1440.0, 2760.0, 3200.0])
    estb = np.ones(4)
    fb, bb = estimate_formants_step(
        jnp.broadcast_to(jnp.asarray(est), (8, 4)),
        jnp.broadcast_to(jnp.asarray(estb), (8, 4)),
        jnp.asarray(res),
        jnp.asarray(rbw),
    )
    for i in range(8):
        f1, b1 = estimate_formants_step(
            jnp.asarray(est), jnp.asarray(estb), jnp.asarray(res[i]), jnp.asarray(rbw[i])
        )
        np.testing.assert_allclose(np.asarray(fb)[i], np.asarray(f1))
        np.testing.assert_allclose(np.asarray(bb)[i], np.asarray(b1))


def test_resample_linear():
    x = jnp.asarray(np.arange(10, dtype=np.float64))
    out = np.asarray(resample_linear(x, 0.5, 5))
    np.testing.assert_allclose(out, [0.0, 2.0, 4.0, 6.0, 8.0])
    out2 = np.asarray(resample_linear(x, 2.0, 20))
    np.testing.assert_allclose(out2[:4], [0.0, 0.5, 1.0, 1.5])


def test_find_formants_sine_runs():
    # End-to-end smoke on a synthetic two-tone signal, framed.
    sr = 11025.0
    t = np.arange(2048) / sr
    x = np.sin(2 * np.pi * 700 * t) + 0.5 * np.sin(2 * np.pi * 2100 * t)
    frames = np.stack([x[i * 512 : i * 512 + 1024] for i in range(3)])
    freqs, bws, status = find_formants(jnp.asarray(frames), sr, 10)
    assert np.all(np.asarray(status) == 0)
    assert np.all(np.isfinite(np.asarray(freqs)))
    # The 2100 Hz tone is tracked in every frame. (The 700 Hz tone is *not*
    # guaranteed: the reference passes its zero-padded [Resonance; 32] buffer
    # into the nearest-match step, and a zero entry is nearer to the 320 Hz
    # starting estimate than 700 is — a quirk reproduced faithfully.)
    got = np.asarray(freqs)
    assert np.all(np.min(np.abs(got - 2100.0), axis=-1) < 30.0), got


def test_resample_sinc_identity_and_tone():
    """resample_sinc (the reference example's commented-out Sinc variant,
    main.rs:48-49): ratio 1 reproduces the signal; up/downsampling a pure
    tone below both Nyquists preserves it to ~1e-3."""
    from voxtpu.formants import resample_sinc

    sr = 16000.0
    t = np.arange(4000) / sr
    x = np.sin(2 * np.pi * 440.0 * t)

    same = np.asarray(resample_sinc(jnp.asarray(x), 1.0, len(x)))
    np.testing.assert_allclose(same, x, atol=1e-9)

    for ratio in (0.5, 2.0):
        out_len = int((len(x) - 1) * ratio) + 1
        out = np.asarray(resample_sinc(jnp.asarray(x), ratio, out_len))
        t2 = np.arange(out_len) / (sr * ratio)
        exp = np.sin(2 * np.pi * 440.0 * t2)
        # ignore the edge taper regions (depth taps each side)
        d = 120
        np.testing.assert_allclose(out[d:-d], exp[d:-d], atol=2e-3)


def test_resample_sinc_antialiases_vs_linear():
    """Downsampling a tone ABOVE the target Nyquist: the sinc resampler's
    cutoff suppresses it; linear interpolation aliases it into band."""
    from voxtpu.formants import resample_linear, resample_sinc

    sr = 44100.0
    t = np.arange(20000) / sr
    x = np.sin(2 * np.pi * 9000.0 * t)  # above the 11025/2 Hz target Nyquist
    ratio = 11025.0 / sr
    out_len = int((len(x) - 1) * ratio) + 1

    lin = np.asarray(resample_linear(jnp.asarray(x), ratio, out_len))
    snc = np.asarray(resample_sinc(jnp.asarray(x), ratio, out_len))
    d = 120
    rms_lin = np.sqrt(np.mean(lin[d:-d] ** 2))
    rms_snc = np.sqrt(np.mean(snc[d:-d] ** 2))
    # the aliased tone survives linear interpolation near full strength and
    # must be heavily attenuated by the bandlimited resampler
    assert rms_lin > 0.3, rms_lin
    assert rms_snc < 0.12 * rms_lin, (rms_snc, rms_lin)
