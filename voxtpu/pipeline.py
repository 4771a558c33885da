"""The fused per-file analysis pipeline: pitch + formants + MFCC + RMS.

This is the voxtpu equivalent of the reference's example drivers
(``/root/reference/examples/formant_extraction/src/main.rs:72-98``,
``examples/pitch_detection.rs:15-49``), which loop frames serially and call
each analysis per frame. Here one jitted program takes the whole framed file
(or a corpus shard) and produces every feature in a single XLA executable:
framing is a strided gather, pitch/MFCC/LPC/roots are frame-parallel, and the
only sequential computation — the 6-slot McCandless carry — runs as a
`lax.scan` over frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from voxtpu import errors, waves
from voxtpu.frame import frame_signal, num_frames
from voxtpu.formants import find_formants, MALE_FORMANT_ESTIMATES
from voxtpu.mfcc import mfcc
from voxtpu.pitch import pitch_frames
from voxtpu.windows import hann

__all__ = ["PitchConfig", "FormantConfig", "MfccConfig", "AnalysisConfig", "analyze_frames", "analyze", "analyze_long"]


@dataclass(frozen=True)
class PitchConfig:
    enabled: bool = True
    threshold: float = 0.2
    fmin: float = 60.0
    fmax: float = 600.0
    max_candidates: int = 32
    #: run the Viterbi path search (voxtpu.viterbi) and report its track as
    #: f0 instead of the strongest candidate (the reference stub's behavior)
    viterbi: bool = False


@dataclass(frozen=True)
class FormantConfig:
    enabled: bool = True
    n_coeffs: int = 13
    resample_ratio: float = 1.0
    estimates: tuple = MALE_FORMANT_ESTIMATES
    estimate_bandwidth: float = 1.0


@dataclass(frozen=True)
class MfccConfig:
    enabled: bool = True
    num_coeffs: int = 13
    freq_lo: float = 100.0
    freq_hi: float = 5000.0
    preemphasis_factor: float | None = None
    exact: bool = True


@dataclass(frozen=True)
class AnalysisConfig:
    """Static analysis parameters (all shape-affecting fields are Python
    values so one config = one compiled executable)."""

    sample_rate: float = 11025.0
    frame_len: int = 1024
    hop: int = 512
    pitch: PitchConfig = field(default_factory=PitchConfig)
    formant: FormantConfig = field(default_factory=FormantConfig)
    mfcc: MfccConfig = field(default_factory=MfccConfig)


@partial(jax.jit, static_argnames=("config",))
def analyze_frames(
    frames: jax.Array,
    config: AnalysisConfig,
    formant_estimates: tuple[jax.Array, jax.Array] | None = None,
) -> dict:
    """Analyze rectangular frames (F, n): returns the full feature dict.

    Windowing follows the reference drivers: pitch and MFCC see
    Hann-windowed frames; `find_formants` windows internally (lib.rs:66-70);
    RMS is computed on the raw frame (tests/lib.rs:80).

    formant_estimates: optional traced (freqs, bws) arrays overriding the
    config's starting estimates — the carry hand-off for chunked/streaming
    analysis (see `analyze_long`).
    """
    frames = jnp.asarray(frames)
    sr = config.sample_rate
    n = frames.shape[-1]
    dt = frames.dtype
    out: dict = {}

    window = jnp.asarray(hann(n), dtype=dt)
    windowed = frames * window

    out["rms"] = waves.rms(frames)
    # Failure detection (SURVEY §5): flag frames with non-finite samples; a
    # bad frame must not abort the batch (reference callers just .unwrap()).
    input_status = jnp.where(
        jnp.all(jnp.isfinite(frames), axis=-1), 0, errors.NONFINITE_INPUT
    ).astype(jnp.int32)

    # When pitch and MFCC both run on the same Hann-windowed frame (no
    # preemphasis) and the frame is a power of two, one batched FFT serves
    # both: the autocorrelation's 2n-point power spectrum's even bins ARE the
    # n-point MFCC power bins (X_n[k] == X_2n[2k] for zero-padded real input).
    share_fft = (
        config.pitch.enabled
        and config.mfcc.enabled
        and config.mfcc.preemphasis_factor is None
        and (n & (n - 1)) == 0
    )
    shared_ac = None
    shared_half_power = None
    if share_fft:
        from voxtpu.autocorr import power_and_autocorrelate

        power2n, shared_ac = power_and_autocorrelate(windowed, n)
        shared_half_power = power2n[..., ::2]

    if config.pitch.enabled:
        p = config.pitch
        freq, strength, valid = pitch_frames(
            windowed, sr, threshold=p.threshold, fmin=p.fmin, fmax=p.fmax,
            max_candidates=p.max_candidates, precomputed_ac=shared_ac,
        )
        out["pitch_candidates_freq"] = freq
        out["pitch_candidates_strength"] = strength
        out["pitch_candidates_valid"] = valid
        if p.viterbi:
            from voxtpu.viterbi import PathConfig, pitch_path

            # Praat's silence-aware unvoiced strength uses the frame's local
            # absolute peak relative to the recording's global peak — the
            # quantities the reference's pitch() accepts but ignores
            # (periodic.rs:357 local_peak/global_peak).
            local_peak = jnp.max(jnp.abs(frames), axis=-1)
            global_peak = jnp.max(local_peak)
            intensity = local_peak / jnp.maximum(global_peak, 1e-30)
            f0, s0 = pitch_path(
                freq, strength, valid, PathConfig(ceiling=p.fmax),
                local_intensity=intensity,
            )
            out["f0"], out["f0_strength"] = f0, s0
        else:
            out["f0"] = freq[..., 0]
            out["f0_strength"] = strength[..., 0]
        # Harmonics-to-noise ratio: the candidate strength IS the normalized
        # autocorrelation at the pitch lag (periodic.rs:387-392 calls it the
        # HNR rating); in dB: 10*log10(r / (1-r)), Boersma 1993 eq. 4.
        s_best = jnp.clip(out["f0_strength"], 1e-6, 1.0 - 1e-6)
        hnr = 10.0 * jnp.log10(s_best / (1.0 - s_best))
        out["hnr_db"] = jnp.where(out["f0"] > 0, hnr, -jnp.inf * jnp.ones_like(hnr))

    if config.formant.enabled:
        f = config.formant
        if formant_estimates is not None:
            est_f, est_b = formant_estimates
        else:
            est_f, est_b = f.estimates, None
        freqs, bws, status = find_formants(
            frames, sr, f.n_coeffs, resample_ratio=f.resample_ratio,
            estimates=est_f, estimate_bandwidth=f.estimate_bandwidth,
            estimate_bws=est_b,
        )
        out["formant_freqs"] = freqs
        out["formant_bws"] = bws
        out["status"] = status | input_status
    else:
        out["status"] = input_status

    if config.mfcc.enabled:
        m = config.mfcc
        x = frames
        if m.preemphasis_factor is not None:
            x = waves.preemphasis(x, m.preemphasis_factor)
        x = x * window
        out["mfcc"] = mfcc(
            x, m.num_coeffs, (m.freq_lo, m.freq_hi), sr, exact=m.exact,
            half_power=shared_half_power,
        )

    return out


def analyze(samples, config: AnalysisConfig) -> dict:
    """Frame a 1-D signal and analyze (host-side convenience wrapper)."""
    frames = frame_signal(jnp.asarray(samples), config.frame_len, config.hop)
    return analyze_frames(frames, config)


def analyze_long(samples, config: AnalysisConfig, chunk_frames: int = 4096) -> dict:
    """Chunked analysis for arbitrarily long recordings, bit-identical to a
    one-shot `analyze`.

    Frames are processed `chunk_frames` at a time (one compiled executable,
    reused across chunks); the only cross-chunk state — the McCandless
    formant-estimate carry — is handed from each chunk's last frame into the
    next chunk's starting estimates, so the tracked trajectory is exactly the
    serial one. Memory stays bounded at O(chunk_frames * frame_len).
    """
    samples = jnp.asarray(samples)
    F = num_frames(samples.shape[-1], config.frame_len, config.hop)
    if F <= chunk_frames:
        return analyze(samples, config)

    hop, n = config.hop, config.frame_len
    est = None
    chunks = []
    for i0 in range(0, F, chunk_frames):
        i1 = min(i0 + chunk_frames, F)
        seg = samples[i0 * hop : (i1 - 1) * hop + n]
        frames = frame_signal(seg, n, hop)
        nf = frames.shape[0]
        if nf < chunk_frames:
            # pad to the compiled shape; padded outputs are trimmed below and
            # zero frames are a formant-tracker no-op, so the carry is exact.
            frames = jnp.pad(frames, [(0, chunk_frames - nf), (0, 0)])
        out = analyze_frames(frames, config, formant_estimates=est)
        if config.formant.enabled:
            est = (out["formant_freqs"][nf - 1], out["formant_bws"][nf - 1])
        chunks.append({k: v[:nf] for k, v in out.items()})

    return {k: jnp.concatenate([c[k] for c in chunks]) for k in chunks[0]}
