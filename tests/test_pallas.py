"""Interpret-mode equivalence tests for the Pallas kernels.

These pin the TPU kernels to their pure-jnp twins (which are themselves
pinned to the scalar reference oracle) — the framework's analogue of the
reference's sanitizer story (SURVEY §5).
"""

import numpy as np
import jax.numpy as jnp

from voxtpu.sinc import brent_maximize_sinc
from voxtpu.ops.refine_pallas import brent_refine_pallas


def test_refine_kernel_matches_jnp():
    rng = np.random.default_rng(0)
    n = 256
    bi = n // 2
    offset = -bi - 1
    nx = bi - offset
    B, C = 3, 8

    # Smooth-ish buffers with real peaks, like a normalized autocorrelation.
    t = np.arange(2 * n)
    y = np.cos(2 * np.pi * t / 37.0) * np.exp(-t / 800.0) + 0.05 * rng.standard_normal(2 * n)
    ys = np.stack([np.roll(y, i) for i in range(B)])

    lags = rng.uniform(20.0, bi - 4, (B, C))
    x0 = lags - offset + rng.uniform(-0.4, 0.4, (B, C))
    valid = rng.random((B, C)) < 0.8
    valid[:, 0] = True

    max_x = float(bi + 2 - offset)
    xe, fe = brent_maximize_sinc(
        jnp.asarray(ys), offset, nx, jnp.asarray(x0), 1200,
        max_x=max_x, lane_mask=jnp.asarray(valid),
    )

    from voxtpu.sinc import _max_effective_depth

    T = _max_effective_depth(offset, nx, 1200, max_x)
    xp, fp = brent_refine_pallas(
        jnp.asarray(ys), jnp.asarray(x0), jnp.asarray(valid),
        offset, 1200, T, interpret=True,
    )

    # The kernel accumulates tap sums in 128-chunks (different fp order than
    # the jnp twin's single reduce); Brent's trajectory is chaotic in the last
    # ulp, so agreement is to Brent's own tolerance, not bitwise.
    m = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(xp)[m], np.asarray(xe)[m], rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fp)[m], np.asarray(fe)[m], rtol=1e-5, atol=1e-7)


def test_pitch_pallas_backend_matches_jnp():
    from voxtpu.pitch import pitch_frames
    from voxtpu.windows import hann
    from util import sine_hz

    x = sine_hz(220.0, 11025.0, 512) * np.asarray(hann(512))
    f1, s1, v1 = pitch_frames(
        jnp.asarray(x)[None], 11025.0, fmin=100.0, fmax=500.0, refine_backend="jnp"
    )
    f2, s2, v2 = pitch_frames(
        jnp.asarray(x)[None], 11025.0, fmin=100.0, fmax=500.0,
        refine_backend="pallas_interpret",
    )
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-7)
