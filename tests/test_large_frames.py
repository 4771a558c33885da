"""Large-frame robustness: frame 8192 / 16384 end-to-end (VERDICT r3 #3).

The reference accepts any frame length ([S] slices, lib.rs:40,
periodic.rs:377); voxtpu's suite never exceeded frame 4096 / nfft 8192 before
this file. Covers: the full pipeline at 8192/16384 (f0 recovery on an
analytic mixture, finite MFCC, clean status), interpret-mode equivalence of
the n-dependent Pallas kernels (fused CT autocorrelation, Brent refine, Burg)
at 8192, and the static VMEM budget gate that makes the fused CT kernel
decline shapes it cannot hold (the workspace-sizer analog, SURVEY §5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze_frames,
)


def _mixture_frames(n, sr=44100.0, f0=150.0, B=2):
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * f0 * t) + 0.3 * np.sin(2 * np.pi * 3 * f0 * t)).astype(
        np.float32
    )
    return np.stack([x * (1.0 - 0.05 * i) for i in range(B)])


@pytest.mark.parametrize("n", [8192, 16384])
def test_pipeline_large_frames(n):
    sr = 44100.0
    cfg = AnalysisConfig(
        sample_rate=sr,
        frame_len=n,
        hop=n // 4,
        pitch=PitchConfig(fmin=60.0, fmax=600.0, max_candidates=16),
        formant=FormantConfig(n_coeffs=13),
        mfcc=MfccConfig(num_coeffs=13, freq_hi=8000.0),
    )
    out = analyze_frames(jnp.asarray(_mixture_frames(n, sr)), cfg)
    f0 = np.asarray(out["f0"])
    assert np.all(np.asarray(out["status"]) == 0)
    assert np.all(np.isfinite(np.asarray(out["mfcc"])))
    # Take-best picks the true period or a subharmonic of it (the AC method's
    # documented octave preference) — either way an integer division of 150.
    ratio = 150.0 / f0
    assert np.all(f0 > 0)
    np.testing.assert_allclose(ratio, np.round(ratio), atol=5e-3)


@pytest.mark.parametrize("n", [8192, 16384])
def test_ct_fused_kernel_large_frames_interpret(n):
    """The fused CT kernel's static layout must compile (interpret) and agree
    with the FFT path at 8192/16384 — both outputs, f32 tolerance."""
    from voxtpu.autocorr import power_and_autocorrelate
    from voxtpu.ops.ct_fused_pallas import ct_fused_supported

    assert ct_fused_supported(n, 2 * n)
    x = jnp.asarray(_mixture_frames(n))
    h_ref, ac_ref = power_and_autocorrelate(x, backend="fft")
    h_ct, ac_ct = power_and_autocorrelate(x, backend="ct_fused_interpret")
    scale_h = float(jnp.max(jnp.abs(h_ref)))
    scale_a = float(jnp.max(jnp.abs(ac_ref)))
    np.testing.assert_allclose(
        np.asarray(h_ct) / scale_h, np.asarray(h_ref) / scale_h, atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(ac_ct) / scale_a, np.asarray(ac_ref) / scale_a, atol=3e-6
    )


def test_refine_kernel_large_frame_interpret():
    """pitch_frames at frame 8192: the Pallas refine kernel (interpret) vs
    the jnp twin at a frame size whose buffer (2n = 16384 lags) exceeds
    anything the r3 suite compiled. The candidate FREQUENCIES must agree
    exactly; strengths agree to f32 ulps (the longer chunk walk regroups the
    reduction, measured 1.8e-7 — enough to swap the sort order of two
    near-tied candidates, so compare frequency-sorted)."""
    from voxtpu.pitch import pitch_frames
    from voxtpu.windows import hann

    n, sr = 8192, 44100.0
    x = _mixture_frames(n, sr)[0] * np.asarray(hann(n), dtype=np.float32)
    args = dict(fmin=60.0, fmax=600.0, max_candidates=8)
    f1, s1, v1 = pitch_frames(jnp.asarray(x)[None], sr, refine_backend="jnp", **args)
    f2, s2, v2 = pitch_frames(
        jnp.asarray(x)[None], sr, refine_backend="pallas_interpret", **args
    )
    f1, s1, f2, s2 = map(np.asarray, (f1, s1, f2, s2))
    assert int(np.asarray(v1).sum()) == int(np.asarray(v2).sum())
    i1, i2 = np.argsort(f1[0]), np.argsort(f2[0])
    np.testing.assert_array_equal(f1[0][i1], f2[0][i2])
    np.testing.assert_allclose(s1[0][i1], s2[0][i2], rtol=0, atol=1e-6)


def _noisy_frames(n, B=2, noise=0.1):
    # Burg on a NEAR-PURE long sine is f32-ill-conditioned (the prediction
    # error underflows the mantissa; measured at 8192: the jnp path lands
    # 0.69 from the f64 oracle while the Pallas kernel lands 0.008 — both
    # "correct" f32 answers to an ill-posed question). Real speech is noisy;
    # test the conditioned regime, where backends agree to ulps.
    rng = np.random.default_rng(7)
    return (_mixture_frames(n, B=B) + noise * rng.standard_normal((B, n))).astype(
        np.float32
    )


def test_burg_kernel_large_frame_interpret():
    from voxtpu.lpc import burg

    x = _noisy_frames(8192)
    c1, s1 = burg(jnp.asarray(x), 13, backend="jnp")
    c2, s2 = burg(jnp.asarray(x), 13, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_ct_fused_vmem_budget_gate():
    """The static VMEM sizer (ops/ct_fused_pallas.ct_fused_vmem_bytes): the
    production family fits, frame 32768 does not — and the unsupported shape
    falls back to the XLA CT chain instead of failing, while a direct kernel
    call raises an actionable error."""
    from voxtpu.ops.ct_fused_pallas import (
        VMEM_BUDGET,
        ct_fused_power_ac,
        ct_fused_supported,
        ct_fused_vmem_bytes,
    )

    for n in (1024, 2048, 4096, 8192, 16384):
        assert ct_fused_supported(n, 2 * n), n
        assert ct_fused_vmem_bytes(n, 2 * n) <= VMEM_BUDGET
    assert not ct_fused_supported(32768, 65536)
    assert ct_fused_vmem_bytes(32768, 65536) > VMEM_BUDGET

    with pytest.raises(ValueError, match="unsupported shape"):
        ct_fused_power_ac(jnp.zeros((1, 32768), jnp.float32), 65536)

    # autocorrelate: silent, correct fallback (tiny B to keep the FFT cheap).
    from voxtpu.autocorr import autocorrelate

    x = jnp.asarray(_mixture_frames(32768, B=1))
    ac_req = autocorrelate(x, 64, backend="ct_fused")
    ac_fft = autocorrelate(x, 64, backend="fft")
    np.testing.assert_allclose(
        np.asarray(ac_req), np.asarray(ac_fft), rtol=1e-5, atol=1e-4
    )
