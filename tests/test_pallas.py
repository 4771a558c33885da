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


def test_formant_scan_kernel_matches_jnp():
    from voxtpu.formants import formant_tracker

    rng = np.random.default_rng(3)
    F, R, L = 12, 32, 4
    # realistic: sorted positive resonances with zero tails of varying length
    rf = np.sort(rng.uniform(100, 4000, (F, R)), axis=1)
    rb = rng.uniform(10, 300, (F, R))
    for i in range(F):
        k = rng.integers(3, 9)
        rf[i, k:] = 0.0
        rb[i, k:] = 0.0
    est_f = jnp.asarray([320.0, 1440.0, 2760.0, 3200.0])
    est_b = jnp.ones(4)

    f1, b1 = formant_tracker(jnp.asarray(rf), jnp.asarray(rb), est_f, est_b, backend="jnp")
    f2, b2 = formant_tracker(
        jnp.asarray(rf), jnp.asarray(rb), est_f, est_b, backend="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=0, atol=0)


def test_formant_scan_kernel_golden_trajectory():
    from voxtpu.formants import formant_tracker

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
    freqs, bws = formant_tracker(
        jnp.asarray(resonances), jnp.asarray(res_bw), est, est_bw,
        backend="pallas_interpret",
    )
    freqs = np.asarray(freqs)
    np.testing.assert_allclose(freqs[0], [150.0, 240.0, 300.0])
    np.testing.assert_allclose(freqs[1], [180.0, 230.0, 310.0])
    np.testing.assert_allclose(freqs[2], [230.0, 270.0, 290.0])


def test_formant_scan_kernel_batched_file_reset():
    """Folded multi-file scan (file_len carry reset inside the kernel) must
    equal per-file serial scans exactly — no state leaks across file
    boundaries (VERDICT r2 #7: single-trace batched tracker)."""
    from voxtpu.formants import formant_tracker, formant_tracker_batched

    rng = np.random.default_rng(17)
    files, F, R, L = 3, 10, 32, 4
    rf = np.sort(rng.uniform(100, 4000, (files, F, R)), axis=-1)
    rb = rng.uniform(10, 300, (files, F, R))
    for i in range(files):
        for t in range(F):
            k = rng.integers(3, 9)
            rf[i, t, k:] = 0.0
            rb[i, t, k:] = 0.0
    est_f = jnp.asarray([320.0, 1440.0, 2760.0, 3200.0])
    est_b = jnp.ones(4)

    bf, bb = formant_tracker_batched(
        jnp.asarray(rf), jnp.asarray(rb), est_f, est_b,
        backend="pallas_interpret",
    )
    vf, vb = formant_tracker_batched(
        jnp.asarray(rf), jnp.asarray(rb), est_f, est_b, backend="jnp"
    )
    for i in range(files):
        sf, sb = formant_tracker(
            jnp.asarray(rf[i]), jnp.asarray(rb[i]), est_f, est_b, backend="jnp"
        )
        np.testing.assert_array_equal(np.asarray(bf)[i], np.asarray(sf))
        np.testing.assert_array_equal(np.asarray(bb)[i], np.asarray(sb))
        np.testing.assert_array_equal(np.asarray(vf)[i], np.asarray(sf))
        np.testing.assert_array_equal(np.asarray(vb)[i], np.asarray(sb))


def test_burg_kernel_matches_jnp():
    from voxtpu.lpc import burg

    rng = np.random.default_rng(7)
    x = rng.standard_normal((11, 256))
    c1, s1 = burg(jnp.asarray(x), 13, backend="jnp")
    c2, s2 = burg(jnp.asarray(x), 13, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))

    z = jnp.zeros((3, 64))
    c3, s3 = burg(z, 4, backend="pallas_interpret")
    from voxtpu import errors
    assert np.all(np.asarray(s3) & errors.LPC_DENUM_NONPOS)


def test_refine_kernel_f32_fuzz_vs_jnp_twin():
    """f32 interpret-mode fuzz: the Pallas refine kernel vs the jnp twin at
    the SAME dtype (both f32) over randomized buffers/starts/masks — the twin
    is oracle-pinned, so this transfers parity to the kernel in the dtype the
    headline number is measured in (VERDICT r1 weak #5)."""
    from voxtpu.sinc import _max_effective_depth

    n = 256
    bi = n // 2
    offset = -bi - 1
    nx = bi - offset
    max_x = float(bi + 2 - offset)
    T = _max_effective_depth(offset, nx, 1200, max_x)

    for seed in range(6):
        rng = np.random.default_rng(100 + seed)
        B, C = 4, 8
        t = np.arange(2 * n)
        period = rng.uniform(17.0, 61.0)
        decay = rng.uniform(400.0, 1200.0)
        y = (
            np.cos(2 * np.pi * t / period) * np.exp(-t / decay)
            + 0.01 * rng.standard_normal(2 * n)
        ).astype(np.float32)
        ys = np.stack([np.roll(y, i * 5) for i in range(B)])

        # Start near actual local maxima (the pipeline always seeds Brent at
        # parabolic-refined peaks): arbitrary slope starts make the two f32
        # trajectories (different tap-sum rounding) wander to different
        # micro-extrema — Brent chaos, not kernel error.
        x0 = np.zeros((B, C), np.float32)
        valid = np.zeros((B, C), bool)
        for b in range(B):
            row = ys[b]
            peaks = [
                i for i in range(22, bi - 6)
                if row[i] > row[i - 1] and row[i] > row[i + 1]
            ]
            rng.shuffle(peaks)
            for c, pk in enumerate(peaks[:C]):
                x0[b, c] = pk - offset + rng.uniform(-0.3, 0.3)
                valid[b, c] = True
        x0 = np.where(valid, x0, float(bi))
        assert valid.sum() >= B  # every row found peaks

        xe, fe = brent_maximize_sinc(
            jnp.asarray(ys), offset, nx, jnp.asarray(x0), 1200,
            max_x=max_x, lane_mask=jnp.asarray(valid),
        )
        xp, fp = brent_refine_pallas(
            jnp.asarray(ys), jnp.asarray(x0), jnp.asarray(valid),
            offset, 1200, T, interpret=True,
        )
        assert xe.dtype == jnp.float32 and xp.dtype == jnp.float32
        m = valid
        # f32 Brent converges to tol_act ~ sqrt(eps_f32)*|x| ~ 0.07 lag at
        # x~200; tap-sum order differs (128-chunk vs single reduce), so the
        # two f32 results agree to that bracket, not to f32 eps. The f budget
        # follows from the bracket and the peak curvature: |df| <= 0.5*kappa*
        # tol_act^2 ~ 5e-4 at kappa ~ 0.25 (measured on these signals).
        np.testing.assert_allclose(
            np.asarray(xp)[m], np.asarray(xe)[m], atol=0.2, err_msg=f"seed {seed}"
        )
        np.testing.assert_allclose(
            np.asarray(fp)[m], np.asarray(fe)[m], rtol=1e-3, atol=5e-4,
            err_msg=f"seed {seed}",
        )
        assert np.all(np.isfinite(np.asarray(xp))) and np.all(np.isfinite(np.asarray(fp)))


def test_refine_kernel_f32_interpret():
    """f32 interpret-mode run of the refine kernel: finite, bracket-bounded,
    close to the f64 answer at f32's own Brent tolerance."""
    rng = np.random.default_rng(17)
    n = 256
    bi = n // 2
    offset = -bi - 1
    nx = bi - offset
    t = np.arange(2 * n)
    y = (np.cos(2 * np.pi * t / 29.0) * np.exp(-t / 700.0)).astype(np.float32)
    ys = np.stack([y, np.roll(y, 3)])
    lags = rng.uniform(20.0, bi - 4, (2, 8))
    x0 = (lags - offset + rng.uniform(-0.4, 0.4, (2, 8))).astype(np.float32)
    valid = np.ones((2, 8), bool)

    from voxtpu.sinc import _max_effective_depth

    max_x = float(bi + 2 - offset)
    T = _max_effective_depth(offset, nx, 1200, max_x)
    xf, ff = brent_refine_pallas(
        jnp.asarray(ys), jnp.asarray(x0), jnp.asarray(valid), offset, 1200, T,
        interpret=True,
    )
    xd, fd = brent_refine_pallas(
        jnp.asarray(ys, dtype=jnp.float64), jnp.asarray(x0, dtype=jnp.float64),
        jnp.asarray(valid), offset, 1200, T, interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(xf)))
    # within the bracket; f32 Brent stops at tol_act ~ sqrt(eps_f32)*|x|
    # (~0.08 lag at x~250), so agreement with f64 is at that granularity
    # (0.06% relative — the documented fast-mode budget, test_fast_mode).
    assert np.all(np.abs(np.asarray(xf) - x0) <= 1.0 + 1e-5)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xd), atol=0.15)


def test_viterbi_kernel_matches_jnp():
    """Single-kernel DP+backtrace (ops/viterbi_pallas.py) is bit-identical to
    the lax.scan twin — incl. argmax tie-breaking, -inf invalid lanes, the
    silence-aware unvoiced strength, and multi-block frame counts."""
    from voxtpu.viterbi import PathConfig, pitch_path

    rng = np.random.default_rng(11)
    for F, C in [(1, 4), (7, 4), (128, 16), (300, 33), (517, 32)]:
        freq = np.where(
            rng.random((F, C)) < 0.3, 0.0, rng.uniform(60.0, 600.0, (F, C))
        )
        # Quantize strengths to force score ties: first-win argmax semantics
        # must match jnp.argmax in both the DP and the final-frame pick.
        strength = np.round(rng.uniform(0.0, 1.0, (F, C)), 1)
        valid = rng.random((F, C)) < 0.9
        valid[:, 0] = True
        li = rng.uniform(0.0, 1.0, F)
        for kw in ({}, {"local_intensity": jnp.asarray(li)}):
            a = pitch_path(
                jnp.asarray(freq), jnp.asarray(strength), jnp.asarray(valid),
                PathConfig(), backend="jnp", **kw,
            )
            b = pitch_path(
                jnp.asarray(freq), jnp.asarray(strength), jnp.asarray(valid),
                PathConfig(), backend="pallas_interpret", **kw,
            )
            np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_formant_scan_kernel_multiblock_collision_fuzz():
    """Equivalence fuzz targeting the scan kernel's r3 scalar-trim rewrite:
    F = 300 spans two full TBLK=128 DMA blocks plus a 44-frame tail (the
    tail's keep-mask was deleted — garbage tail frames must never corrupt
    carried state or outputs), and resonances are quantized to a coarse grid
    so nearest-matches collide constantly, driving the dedup (step 3) and
    duplicate-fill (step 4) chains the sentinel encoding rewrote. L=6 uses
    every slot."""
    from voxtpu.formants import formant_tracker

    rng = np.random.default_rng(11)
    F, R = 300, 32
    rf = np.sort(rng.uniform(100, 4000, (F, R)), axis=1)
    rf = np.round(rf / 200.0) * 200.0  # coarse grid -> frequent collisions
    rb = np.round(rng.uniform(10, 300, (F, R)) / 50.0) * 50.0
    for i in range(F):
        k = rng.integers(2, 9)
        rf[i, k:] = 0.0
        rb[i, k:] = 0.0
    for L, est in [
        (4, [320.0, 1440.0, 2760.0, 3200.0]),
        (6, [300.0, 900.0, 1500.0, 2100.0, 2700.0, 3300.0]),
    ]:
        est_f = jnp.asarray(est)
        est_b = jnp.ones(L)
        f1, b1 = formant_tracker(
            jnp.asarray(rf), jnp.asarray(rb), est_f, est_b, backend="jnp"
        )
        f2, b2 = formant_tracker(
            jnp.asarray(rf), jnp.asarray(rb), est_f, est_b,
            backend="pallas_interpret",
        )
        np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))
        np.testing.assert_array_equal(np.asarray(b2), np.asarray(b1))


def test_pitch_pre_kernel_bitexact_vs_jitted_jnp_block():
    """The fused pitch pre-stage (ops/pitch_pre_pallas.py, VERDICT r3 #9) is
    bit-identical to the production jnp block UNDER JIT — XLA's algebraic
    simplifier folds the two divisions (/max, /lagwindow) into one, and the
    kernel matches that folded arithmetic (an eager jnp run differs by f32
    ulps; parity is defined by the jitted pipeline)."""
    import jax

    from voxtpu.autocorr import autocorrelate
    from voxtpu.ops.pitch_pre_pallas import pitch_pre_pallas
    from voxtpu.windows import hanning_lag

    rng = np.random.default_rng(5)
    n, sr, fmin, fmax = 1024, 11025.0, 60.0, 500.0
    bi = n // 2
    x = rng.standard_normal((9, n)).astype(np.float32)
    x[3] = 0.0  # degenerate frame: NaN row must zero, not poison
    ac = autocorrelate(jnp.asarray(x), n)
    hl = np.asarray(hanning_lag(n), np.float32)

    @jax.jit
    def jnp_block(ac):
        sl = ac / jnp.max(jnp.abs(ac), axis=-1, keepdims=True)
        sl = sl / jnp.asarray(hl)
        sl = jnp.where(jnp.isfinite(sl), sl, jnp.zeros_like(sl))
        sl = jnp.concatenate([sl, jnp.zeros_like(sl)], axis=-1)
        seg = sl[:, :bi]
        is_max = (seg[:, :-2] < seg[:, 1:-1]) & (seg[:, 2:] < seg[:, 1:-1])
        ix = jnp.arange(1, bi - 1)
        peak, rev, fwd = seg[:, 1:-1], seg[:, :-2], seg[:, 2:]
        dr = 0.5 * (fwd - rev)
        d2r = 2.0 * peak - (rev - fwd)
        freq = sr / (ix.astype(jnp.float32)[None, :] + dr / d2r)
        cand = is_max & ((freq == 0.0) | ((freq > fmin) & (freq < fmax)))
        return sl, jnp.where(cand, freq, 0.0), cand

    sl1, f1, c1 = jnp_block(ac)
    sl2, f2, c2 = pitch_pre_pallas(
        ac, hl, n, bi, sr, fmin, fmax, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sl1), np.asarray(sl2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2)[:, 1 : bi - 1])
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2)[:, 1 : bi - 1])
    # lag 0 and the last lag are never candidates (centers are 1..bi-2)
    assert not np.asarray(c2)[:, 0].any() and not np.asarray(c2)[:, bi - 1].any()
