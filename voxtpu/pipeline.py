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

__all__ = ["PitchConfig", "FormantConfig", "MfccConfig", "AnalysisConfig", "analyze_frames", "analyze", "analyze_batch", "analyze_long", "StreamAnalyzer", "analyze_stream", "finalize_viterbi"]


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
    #: "sinc" = the reference's second pass (Brent over windowed sinc,
    #: periodic.rs:440-450); "parabolic" = first-pass-only turbo (parabolic
    #: vertex + depth-30 strength; ~0.1% max f0 error on real speech —
    #: measured, PERFORMANCE.md; documented deviation, PARITY.md)
    refine: str = "sinc"
    #: cap on the refine pass's sinc depth; None = the reference's 1200.
    #: Lower caps (e.g. Praat-style 70) shrink the kernel's tap window —
    #: measured f0 bit-identical on real speech down to 70 (PERFORMANCE.md)
    refine_depth: int | None = None


@dataclass(frozen=True)
class FormantConfig:
    enabled: bool = True
    n_coeffs: int = 13
    resample_ratio: float = 1.0
    estimates: tuple = MALE_FORMANT_ESTIMATES
    estimate_bandwidth: float = 1.0
    #: compensated-Newton root polish on the f32 fast path (beats the
    #: reference's accuracy; a no-op in f64 parity mode — see
    #: formants.formant_candidates / roots.polish_roots)
    polish: bool = True


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


def f0_outputs(f0: jax.Array, strength: jax.Array) -> dict:
    """f0 / f0_strength / hnr_db features from a chosen pitch track.

    Harmonics-to-noise ratio: the candidate strength IS the normalized
    autocorrelation at the pitch lag (periodic.rs:387-392 calls it the HNR
    rating); in dB: 10*log10(r / (1-r)), Boersma 1993 eq. 4.
    """
    s_best = jnp.clip(strength, 1e-6, 1.0 - 1e-6)
    hnr = 10.0 * jnp.log10(s_best / (1.0 - s_best))
    return {
        "f0": f0,
        "f0_strength": strength,
        "hnr_db": jnp.where(f0 > 0, hnr, -jnp.inf * jnp.ones_like(hnr)),
    }


def f0_outputs_host(f0: np.ndarray, strength: np.ndarray) -> dict:
    """NumPy twin of `f0_outputs` for host-side post-passes (the serving
    daemon's per-request Viterbi runs on trimmed host arrays). One definition
    of the strength->HNR mapping: adjust it here AND above, never in a
    caller."""
    s_best = np.clip(strength, 1e-6, 1.0 - 1e-6)
    hnr = (10.0 * np.log10(s_best / (1.0 - s_best))).astype(strength.dtype)
    return {
        "f0": f0,
        "f0_strength": strength,
        "hnr_db": np.where(f0 > 0, hnr, np.asarray(-np.inf, dtype=hnr.dtype)),
    }


@partial(jax.jit, static_argnames=("config", "return_formant_candidates"))
def analyze_frames(
    frames: jax.Array,
    config: AnalysisConfig,
    formant_estimates: tuple[jax.Array, jax.Array] | None = None,
    return_formant_candidates: bool = False,
) -> dict:
    """Analyze rectangular frames (F, n): returns the full feature dict.

    Windowing follows the reference drivers: pitch and MFCC see
    Hann-windowed frames; `find_formants` windows internally (lib.rs:66-70);
    RMS is computed on the raw frame (tests/lib.rs:80).

    formant_estimates: optional traced (freqs, bws) arrays overriding the
    config's starting estimates — the carry hand-off for chunked/streaming
    analysis (see `analyze_long`).

    return_formant_candidates: skip the sequential McCandless tracker and
    return the per-frame resonance buffers ("resonance_freqs"/"resonance_bws")
    instead of "formant_freqs"/"formant_bws" — everything in the output is
    then frame-parallel, which is what `voxtpu.dist.sharded_analyze` needs to
    shard frames freely and run the carry exactly across shards.
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

        shared_half_power, shared_ac = power_and_autocorrelate(windowed, n)

    if config.pitch.enabled:
        p = config.pitch
        freq, strength, valid = pitch_frames(
            windowed, sr, threshold=p.threshold, fmin=p.fmin, fmax=p.fmax,
            max_candidates=p.max_candidates, precomputed_ac=shared_ac,
            refine=p.refine, refine_depth=p.refine_depth,
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
            out.update(f0_outputs(f0, s0))
        else:
            out.update(f0_outputs(freq[..., 0], strength[..., 0]))

    if config.formant.enabled:
        f = config.formant
        if return_formant_candidates:
            from voxtpu.formants import formant_candidates

            rfreq, rbw, status = formant_candidates(
                frames, sr, f.n_coeffs, resample_ratio=f.resample_ratio,
                polish=f.polish,
            )
            out["resonance_freqs"] = rfreq
            out["resonance_bws"] = rbw
            out["status"] = status | input_status
        else:
            if formant_estimates is not None:
                est_f, est_b = formant_estimates
            else:
                est_f, est_b = f.estimates, None
            freqs, bws, status = find_formants(
                frames, sr, f.n_coeffs, resample_ratio=f.resample_ratio,
                estimates=est_f, estimate_bandwidth=f.estimate_bandwidth,
                estimate_bws=est_b, polish=f.polish,
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


@partial(jax.jit, static_argnames=("config",))
def analyze_batch(frames: jax.Array, config: AnalysisConfig) -> dict:
    """Analyze a stack of same-shape recordings (B, F, n) in ONE compiled
    program — the files-axis batch entry point (serving micro-batches,
    corpus blocks on a single device; `voxtpu.dist.sharded_analyze` is the
    mesh-sharded version of the same shape).

    Per-file isolation is exact: the McCandless carry
    (/root/reference/src/spectrum.rs:336-369 is strictly per recording) and
    the Viterbi path + its global intensity peak never cross file
    boundaries, so row b equals `analyze_frames(frames[b], config)` up to
    XLA batch-shape scheduling (pinned in tests/test_serve.py). All-zero
    rows are safe padding: degenerate frames produce no pitch candidates
    and an all-None formant trajectory, never NaNs (voxtpu/pitch.py zeroes
    degenerate lag rows).
    """
    from voxtpu.formants import formant_tracker_batched

    frames = jnp.asarray(frames)
    B, F, n = frames.shape
    do_formants = config.formant.enabled
    do_viterbi = config.pitch.enabled and config.pitch.viterbi
    inner = config
    if do_viterbi:
        import dataclasses

        inner = dataclasses.replace(
            config, pitch=dataclasses.replace(config.pitch, viterbi=False)
        )

    # Frame-parallel stages carry no cross-frame state: flatten (B, F) into
    # one frame batch; the sequential stages below run per file.
    out = analyze_frames(
        frames.reshape(-1, n), inner, return_formant_candidates=do_formants
    )
    out = {k: v.reshape((B, F) + v.shape[1:]) for k, v in out.items()}

    if do_formants:
        rf = out.pop("resonance_freqs")  # (B, F, R)
        rb = out.pop("resonance_bws")
        est_f = jnp.asarray(config.formant.estimates, dtype=frames.dtype)
        est_b = jnp.full_like(est_f, config.formant.estimate_bandwidth)
        freqs, bws = formant_tracker_batched(rf, rb, est_f, est_b)
        out["formant_freqs"] = freqs
        out["formant_bws"] = bws

    if do_viterbi:
        from voxtpu.viterbi import PathConfig, pitch_path

        local_peak = jnp.max(jnp.abs(frames), axis=-1)  # (B, F)
        global_peak = jnp.max(local_peak, axis=1, keepdims=True)
        intensity = local_peak / jnp.maximum(global_peak, 1e-30)
        cfg = PathConfig(ceiling=config.pitch.fmax)
        f0, s0 = jax.vmap(
            lambda f, s, v, li: pitch_path(f, s, v, cfg, local_intensity=li)
        )(
            out["pitch_candidates_freq"],
            out["pitch_candidates_strength"],
            out["pitch_candidates_valid"],
            intensity,
        )
        out.update(f0_outputs(f0, s0))

    return out


@partial(jax.jit, static_argnames=("config",))
def analyze_batch_padded(samples: jax.Array, lengths: jax.Array,
                         config: AnalysisConfig) -> dict:
    """analyze_batch over a host-stacked (B, S) block of zero-padded raw
    signals: framing, per-file valid-frame masking, and the whole pipeline
    run as ONE compiled program — one dispatch + one result fetch per block.

    This is the corpus batching entry point (cli.py cmd_corpus
    --batch-files). Stacking FRAMED tensors instead would cost B eager
    pad/stack dispatches (~25 ms each through the axon tunnel) and upload 4x
    the audio bytes; here the host uploads raw samples once and the frames
    never exist outside the graph.

    lengths (B,) int32: each file's true sample count. Frames that would
    read past a file's end (they contain the file tail + pad zeros, NOT
    all-zero, so they would emit real pitch candidates and perturb that
    file's Viterbi path) are zeroed in-graph; all-zero frames are exact
    padding for every stage (see analyze_batch). Row b, trimmed to the
    file's frame count, equals analyze(samples_b, config) — pinned in
    tests/test_cli.py.
    """
    samples = jnp.asarray(samples)
    B, S = samples.shape
    frames = jax.vmap(
        lambda x: frame_signal(x, config.frame_len, config.hop)
    )(samples)  # (B, F, n)
    F = frames.shape[1]
    nf = jnp.maximum(
        (jnp.asarray(lengths, jnp.int32) - config.frame_len) // config.hop + 1, 0
    )  # (B,) valid frame counts
    mask = jnp.arange(F, dtype=jnp.int32)[None, :] < nf[:, None]
    frames = frames * mask[:, :, None].astype(frames.dtype)
    return analyze_batch(frames, config)


@partial(jax.jit, static_argnames=("config",))
def _analyze_batch_padded_packed(samples, lengths, config: AnalysisConfig):
    """analyze_batch_padded with every feature packed FRAME-MAJOR into ONE
    (B, F, W) buffer in-graph — one fetched buffer instead of a ~12-feature
    dict. Through the axon tunnel each fetched buffer pays a fixed ~25 ms
    roundtrip (the dict costs ~300 ms fetched naively — measured both in
    serve._packed_analyze and scripts/perf_corpus.py), and local PJRT still
    prefers one contiguous D2H copy. Frame-major layout lets the caller
    slice away rung padding (rows past the block's true max frame count)
    before the fetch — at the top 1024 rung the padding is the bulk of the
    bytes (measured: 4.1 MB/group padded vs ~1.4 MB actual). Packing keeps
    the samples dtype, so float64 parity mode round-trips exactly."""
    out = analyze_batch_padded(samples, lengths, config)
    B, F = samples.shape[0], 0
    for v in out.values():
        F = v.shape[1]
        break
    return jnp.concatenate(
        [out[k].reshape(B, F, -1).astype(samples.dtype) for k in sorted(out)],
        axis=2,
    )


_PADDED_MANIFESTS: dict = {}


def padded_manifest(config: AnalysisConfig, B: int, S: int, dtype) -> list:
    """(key, shape, dtype) unpack manifest for analyze_batch_padded outputs
    at a given block shape — trace-time only (jax.eval_shape), memoized."""
    dt = np.dtype(dtype)
    key = (config, B, S, dt.str)
    m = _PADDED_MANIFESTS.get(key)
    if m is None:
        spec = jax.eval_shape(
            analyze_batch_padded,
            jax.ShapeDtypeStruct((B, S), dt),
            jax.ShapeDtypeStruct((B,), np.int32),
            config,
        )
        m = [(k, tuple(v.shape), np.dtype(v.dtype)) for k, v in sorted(spec.items())]
        _PADDED_MANIFESTS[key] = m
    return m


def _unpack_frames(flat: np.ndarray, manifest) -> dict:
    """Invert the frame-major (B, F, W) packing (serve._unpack's sibling for
    the column layout). flat may be row-trimmed to fewer frames than the
    manifest's padded F — shapes follow flat."""
    out = {}
    B, F = flat.shape[0], flat.shape[1]
    col = 0
    for k, shape, dtype in manifest:
        w = int(np.prod(shape[2:], dtype=np.int64)) if len(shape) > 2 else 1
        v = flat[:, :, col : col + w].reshape((B, F) + shape[2:])
        col += w
        if dtype == np.bool_:
            v = v != 0
        elif np.issubdtype(dtype, np.integer):
            v = np.rint(v).astype(dtype)
        out[k] = v
    return out


def analyze_batch_padded_fetch(samples, lengths, config: AnalysisConfig,
                               trim_to: int | None = None) -> dict:
    """Host convenience wrapper: packed dispatch + ONE buffer fetch + unpack.
    Returns the analyze_batch_padded dict as host numpy arrays.

    trim_to: fetch only the first trim_to frame rows (the block's true max
    frame count, known on the host from lengths) — the eager device-side
    slice pipelines behind the pipeline dispatch and cuts the fetched bytes
    to the data that exists."""
    samples = np.asarray(samples)
    lengths = np.asarray(lengths, np.int32)
    manifest = padded_manifest(config, samples.shape[0], samples.shape[1],
                               samples.dtype)
    flat = _analyze_batch_padded_packed(samples, lengths, config)
    if trim_to is not None and trim_to < flat.shape[1]:
        flat = flat[:, :trim_to, :]
    return _unpack_frames(np.asarray(flat), manifest)


def _long_chunk_body(samples, start_frame, est, config: AnalysisConfig, chunk_frames: int):
    """One analyze_long chunk: dynamic-slice the chunk's samples, frame,
    analyze with the carried formant estimates, extract the next carry and
    per-frame peaks."""
    n, hop = config.frame_len, config.hop
    seg = jax.lax.dynamic_slice(
        samples, (start_frame * hop,), ((chunk_frames - 1) * hop + n,)
    )
    frames = frame_signal(seg, n, hop)
    out = analyze_frames(frames, config, formant_estimates=est)
    if config.formant.enabled:
        est = (out["formant_freqs"][-1], out["formant_bws"][-1])
    peak = jnp.max(jnp.abs(frames), axis=-1)
    return out, est, peak


@partial(jax.jit, static_argnames=("config", "chunk_frames", "F"))
def _long_scan(samples, est0, config: AnalysisConfig, chunk_frames: int, F: int):
    """The whole chunked analysis as ONE compiled program: lax.scan threads
    the formant carry across chunks on-device, and the zero-pad (an exact
    tracker no-op) and final trim to F frames happen in-graph — an hour of
    audio costs one dispatch + one fetch instead of nchunks dispatches plus
    per-feature merges (every extra remote dispatch costs ~0.3 s through the
    axon tunnel; a local PJRT runtime pays micro-seconds, but one fused
    program is the right shape either way). Specialized on the recording's
    frame count; the persistent compile cache amortizes repeats."""
    n, hop = config.frame_len, config.hop
    nchunks = -(-F // chunk_frames)
    need = (nchunks * chunk_frames - 1) * hop + n
    if samples.shape[-1] < need:
        samples = jnp.pad(samples, (0, need - samples.shape[-1]))

    def step(est, ci):
        out, est, peak = _long_chunk_body(
            samples, ci * chunk_frames, est, config, chunk_frames
        )
        return est, (out, peak)

    _, (outs, peaks) = jax.lax.scan(
        step, est0, jnp.arange(nchunks, dtype=jnp.int32)
    )
    full = {
        k: v.reshape((nchunks * chunk_frames,) + v.shape[2:])[:F]
        for k, v in outs.items()
    }
    return full, peaks.reshape(-1)[:F]


def analyze_long(samples, config: AnalysisConfig, chunk_frames: int = 4096) -> dict:
    """Chunked analysis for arbitrarily long recordings, bit-identical to a
    one-shot `analyze`.

    The whole recording runs as ONE compiled `lax.scan` over chunks
    (`_long_scan`): frames are processed `chunk_frames` at a time and
    cross-chunk state is handled exactly:

    - the McCandless formant-estimate carry threads from each chunk's last
      frame into the next chunk's starting estimates on-device, so the
      tracked trajectory is exactly the serial one;
    - with ``config.pitch.viterbi`` the path search (and its whole-recording
      intensity peak) cannot be chunk-local — per-chunk candidates and frame
      peaks are scanned out and the Viterbi DP runs once over the full
      arrays at the end, matching the one-shot path exactly.

    Per-chunk device compute is O(chunk_frames * frame_len); the scanned-out
    per-frame *features* (a few hundred floats per frame, frame_len-free)
    occupy O(total_frames). The executable specializes on the recording's
    frame count (the persistent compile cache amortizes repeats); for
    bounded-memory incremental consumption use `analyze_stream`.
    """
    samples = jnp.asarray(samples)
    F = num_frames(samples.shape[-1], config.frame_len, config.hop)
    if F <= chunk_frames:
        return analyze(samples, config)

    do_viterbi = config.pitch.enabled and config.pitch.viterbi
    inner = config
    if do_viterbi:
        import dataclasses

        inner = dataclasses.replace(
            config, pitch=dataclasses.replace(config.pitch, viterbi=False)
        )

    est_f = jnp.asarray(config.formant.estimates, dtype=samples.dtype)
    est = (est_f, jnp.full_like(est_f, config.formant.estimate_bandwidth))

    full, peaks_flat = _long_scan(samples, est, inner, chunk_frames, F)

    if do_viterbi:
        from voxtpu.viterbi import PathConfig, pitch_path

        local_peak = peaks_flat
        intensity = local_peak / jnp.maximum(jnp.max(local_peak), 1e-30)
        f0, s0 = pitch_path(
            full["pitch_candidates_freq"],
            full["pitch_candidates_strength"],
            full["pitch_candidates_valid"],
            PathConfig(ceiling=config.pitch.fmax),
            local_intensity=intensity,
        )
        full.update(f0_outputs(f0, s0))

    return full


class StreamAnalyzer:
    """Incremental push-style streaming analysis with an exact formant carry.

    The state machine behind `analyze_stream`, exposed directly for callers
    that receive audio asynchronously (the serving daemon's `/stream/*`
    endpoints): `feed(block)` accepts an arbitrarily-sized 1-D sample block
    and returns the list of completed `chunk_frames`-frame feature chunks it
    unlocked (possibly empty), `finish()` flushes the final partial chunk.
    Memory is bounded: one chunk of frames plus a ``frame_len - hop`` sample
    tail. The McCandless formant carry threads exactly across chunks, so the
    concatenation of all returned chunks equals the one-shot `analyze` of the
    concatenated input. Each chunk carries one internal ``_stream_local_peak``
    key consumed by `finalize_viterbi` (underscore keys are not features).

    ``config.pitch.viterbi`` is rejected: the path search needs the whole
    recording (collect the chunks and call `finalize_viterbi` at end of
    stream).

    step: optional override of the per-chunk device call, for runtimes that
    pack the feature dict into fewer device fetches (voxtpu/serve.py).
    Signature ``step(frames, nf, est) -> (feature_dict, next_est)`` where
    `frames` is the zero-padded (chunk_frames, n) array, `nf` the real frame
    count, and `est` the opaque carry threaded between calls (None first).
    The returned dict must include ``_stream_local_peak`` and is trimmed to
    `nf` frames here.

    step_samples: like `step` but receives the HOST sample buffer instead of
    device frames: ``step_samples(samples, nf, est)`` with `samples` a
    zero-padded ((chunk_frames-1)*hop + frame_len,) float32 numpy array. The
    callee frames in-graph and MUST zero frame rows >= nf (rows past the
    last full frame overlap the real tail samples — see
    analyze_batch_padded). Shipping samples instead of frames cuts the
    host->device bytes ~frame_len/hop-fold and removes the eager framing
    dispatches (~25 ms each through the axon tunnel; serve.py's stream
    sessions use this). Mutually exclusive with `step`.
    """

    def __init__(self, config: AnalysisConfig, chunk_frames: int = 512, step=None,
                 step_samples=None):
        if step is not None and step_samples is not None:
            raise ValueError("pass step or step_samples, not both")
        if config.pitch.enabled and config.pitch.viterbi:
            raise ValueError(
                "streaming analysis cannot run Viterbi (whole-recording DP); "
                "stream with viterbi=False and call finalize_viterbi(chunks, "
                "config) on the collected chunks at end of stream"
            )
        self.config = config
        self.chunk_frames = int(chunk_frames)
        self._hop, self._n = config.hop, config.frame_len
        self._chunk_samples = (self.chunk_frames - 1) * self._hop + self._n
        self._est = None
        self._buf = None
        self._step = step if step is not None else self._default_step
        self._step_samples = step_samples
        self.frames_done = 0

    def _default_step(self, frames, nf, est):
        out = analyze_frames(frames, self.config, formant_estimates=est)
        if self.config.formant.enabled:
            est = (out["formant_freqs"][nf - 1], out["formant_bws"][nf - 1])
        # Per-frame intensity summary so finalize_viterbi can reconstruct the
        # whole-recording silence-aware path after the stream ends.
        out["_stream_local_peak"] = jnp.max(jnp.abs(frames), axis=-1)
        return out, est

    def _emit_chunk(self, nf: int) -> dict:
        if self._step_samples is not None:
            pad = np.zeros((self._chunk_samples,), self._buf.dtype)
            L = (nf - 1) * self._hop + self._n
            pad[:L] = self._buf[:L]
            out, self._est = self._step_samples(pad, nf, self._est)
        else:
            frames = frame_signal(
                jnp.asarray(self._buf[: (nf - 1) * self._hop + self._n]),
                self._n, self._hop,
            )
            if nf < self.chunk_frames:
                frames = jnp.pad(frames, [(0, self.chunk_frames - nf), (0, 0)])
            out, self._est = self._step(frames, nf, self._est)
        self._buf = self._buf[nf * self._hop :]  # keep the overlap tail
        self.frames_done += nf
        return {k: v[:nf] for k, v in out.items()}

    @property
    def buffered_samples(self) -> int:
        return 0 if self._buf is None else len(self._buf)

    def feed(self, block) -> list:
        """Append a sample block; return the completed chunks it unlocked."""
        block = np.asarray(block).ravel()
        if block.size:
            self._buf = (
                block if self._buf is None else np.concatenate([self._buf, block])
            )
        chunks = []
        while self._buf is not None and len(self._buf) >= self._chunk_samples:
            chunks.append(self._emit_chunk(self.chunk_frames))
        return chunks

    def finish(self) -> list:
        """Flush the final partial chunk (0 or 1 chunks)."""
        nf = (
            0 if self._buf is None
            else min(num_frames(len(self._buf), self._n, self._hop), self.chunk_frames)
        )
        if nf == 0:
            return []
        return [self._emit_chunk(nf)]


def analyze_stream(blocks, config: AnalysisConfig, chunk_frames: int = 512):
    """Streaming analysis: a generator over an iterable of sample blocks.

    Accepts arbitrarily-sized 1-D sample blocks (a microphone callback, a
    pipe, a file reader) and yields per-chunk feature dicts of up to
    ``chunk_frames`` frames each, as soon as enough audio has arrived — a thin
    pull-style generator over `StreamAnalyzer` (see its docstring for the
    carry/memory/equality contract; `write_features` skips the internal
    underscore keys)."""
    analyzer = StreamAnalyzer(config, chunk_frames)
    for blk in blocks:
        yield from analyzer.feed(blk)
    yield from analyzer.finish()


def finalize_viterbi(chunks, config: AnalysisConfig) -> dict:
    """End-of-stream Viterbi: concatenate `analyze_stream` chunks and run the
    whole-recording path search (DP + global intensity peak), yielding the
    same f0/f0_strength/hnr_db as one-shot `analyze` with viterbi=True."""
    from voxtpu.viterbi import PathConfig, pitch_path

    chunks = list(chunks)
    full = {k: jnp.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    local_peak = full.pop("_stream_local_peak")
    intensity = local_peak / jnp.maximum(jnp.max(local_peak), 1e-30)
    f0, s0 = pitch_path(
        full["pitch_candidates_freq"],
        full["pitch_candidates_strength"],
        full["pitch_candidates_valid"],
        PathConfig(ceiling=config.pitch.fmax),
        local_intensity=intensity,
    )
    full.update(f0_outputs(f0, s0))
    return full
