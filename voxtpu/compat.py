"""Reference-shaped compatibility surface for migrating vox_box.rs callers.

Everything here is a thin adapter over the batched voxtpu kernels, shaped
like the reference's public API (SURVEY.md API census) so a caller of the
Rust library finds a same-named entry point:

- `find_formants_real_work_size` / `find_formants_complex_work_size`
  (lib.rs:30-36): workspace sizing is meaningless under XLA (the compiler
  owns buffers); kept as documented no-ops returning the reference's sizes.
- `FormantExtractor` (spectrum.rs:336-369): iterator over per-frame formant
  estimates. Internally runs the batched scan once and iterates the result.
- `PitchExtractor` (periodic.rs:320-354): the reference's stub returns
  candidates[frame][0]; `use_path=True` gives the real Viterbi path search.
- `pitch` (periodic.rs:356-358 6-arg form, plus the 8-arg Praat-complete form
  the stale callers reveal, benches/periodic.rs:39).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from voxtpu.formants import formant_tracker
from voxtpu.pitch import pitch_frames
from voxtpu.viterbi import PathConfig, pitch_path, take_best

__all__ = [
    "find_formants_real_work_size",
    "find_formants_complex_work_size",
    "Pitch",
    "Resonance",
    "FormantExtractor",
    "PitchExtractor",
    "pitch",
    "pitch_praat",
]


def find_formants_real_work_size(buf_len: int, n_coeffs: int) -> int:
    """lib.rs:30-32. XLA manages workspaces; returned for API parity only."""
    return buf_len * 2 + n_coeffs * 23 + 2


def find_formants_complex_work_size(n_coeffs: int) -> int:
    """lib.rs:34-36. XLA manages workspaces; returned for API parity only."""
    return n_coeffs * 7 + 4


@dataclass
class Pitch:
    frequency: float
    strength: float


@dataclass
class Resonance:
    frequency: float
    bandwidth: float


class FormantExtractor:
    """Iterator over tracked formants (spectrum.rs:336-369 semantics).

    Accepts per-frame resonance lists; the scan runs batched once on
    construction, iteration yields per-frame `[Resonance]` snapshots.

    .. warning:: Each distinct (frame count, resonance capacity) shape traces
       and compiles a fresh XLA program — minutes per shape on TPU through a
       remote tunnel. Constructing one extractor per recording is fine;
       constructing one per *frame* (a natural translation of the reference's
       iterator idiom) is a recompile trap. For whole-recording work use
       `voxtpu.formants.find_formants` / `formant_tracker` directly — one
       compile covers every same-shape recording.
    """

    def __init__(self, num_formants: int, resonances, starting_estimates):
        self.num_formants = num_formants
        frames = list(resonances)
        if not frames:
            self._freqs = np.zeros((0, num_formants))
            self._bws = np.zeros((0, num_formants))
        else:
            R = max(len(f) for f in frames)
            rf = np.zeros((len(frames), R))
            rb = np.zeros((len(frames), R))
            for i, f in enumerate(frames):
                for j, r in enumerate(f):
                    rf[i, j], rb[i, j] = r.frequency, r.bandwidth
            ef = jnp.asarray([e.frequency for e in starting_estimates], dtype=jnp.float64
                             if rf.dtype == np.float64 else jnp.float32)
            eb = jnp.asarray([e.bandwidth for e in starting_estimates], dtype=ef.dtype)
            freqs, bws = formant_tracker(jnp.asarray(rf), jnp.asarray(rb), ef, eb)
            self._freqs = np.asarray(freqs)
            self._bws = np.asarray(bws)
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= self._freqs.shape[0]:
            raise StopIteration
        out = [
            Resonance(float(f), float(b))
            for f, b in zip(self._freqs[self._i], self._bws[self._i])
        ]
        self._i += 1
        return out


class PitchExtractor:
    """periodic.rs:320-354 semantics: `use_path=False` reproduces the stub
    (candidates[frame][0]); True runs the real Viterbi search the reference
    left unimplemented."""

    def __init__(self, candidates, voiced_unvoiced_cost=0.14, voicing_threshold=0.45,
                 use_path: bool = False):
        frames = list(candidates)
        C = max((len(f) for f in frames), default=1)
        freq = np.zeros((len(frames), C))
        strength = np.full((len(frames), C), -np.inf)
        valid = np.zeros((len(frames), C), dtype=bool)
        for i, f in enumerate(frames):
            for j, p in enumerate(f):
                freq[i, j], strength[i, j] = p.frequency, p.strength
                valid[i, j] = True
        if not frames:
            self._f0 = np.zeros(0)
            self._s0 = np.zeros(0)
        elif use_path:
            cfg = PathConfig(
                voiced_unvoiced_cost=voiced_unvoiced_cost,
                voicing_threshold=voicing_threshold,
            )
            f0, s0 = pitch_path(
                jnp.asarray(freq), jnp.asarray(np.where(valid, strength, -np.inf)),
                jnp.asarray(valid), cfg,
            )
            self._f0, self._s0 = np.asarray(f0), np.asarray(s0)
        else:
            self._f0, self._s0 = freq[:, 0], strength[:, 0]
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self._f0):
            raise StopIteration
        out = Pitch(float(self._f0[self._i]), float(self._s0[self._i]))
        self._i += 1
        return out


def pitch(frame, sample_rate, threshold, local_peak, global_peak, fmin, fmax,
          max_candidates: int = 32):
    """The reference's 6-arg `Pitched::pitch` (periodic.rs:356-358) for one
    pre-windowed frame: returns [Pitch] sorted by strength descending.

    .. warning:: This is a migration shim, not a hot-loop API. Every distinct
       frame *length* compiles a fresh B=1 XLA program (minutes on TPU), and
       calling it per frame serializes one device roundtrip per frame. The
       reference's `for frame in windower: frame.pitch(...)` loop should
       migrate to ONE `voxtpu.pitch.pitch_frames(frames, ...)` call on the
       (F, n) frame batch — one trace, one dispatch, every frame in parallel
       (see tests/test_compat.py::test_batched_pitch_is_single_trace).
    """
    freq, strength, valid = pitch_frames(
        jnp.asarray(frame)[None, :], float(sample_rate), threshold=threshold,
        local_peak=local_peak, global_peak=global_peak,
        fmin=float(fmin), fmax=float(fmax), max_candidates=max_candidates,
    )
    f = np.asarray(freq)[0]
    s = np.asarray(strength)[0]
    v = np.asarray(valid)[0]
    return [Pitch(float(a), float(b)) for a, b, ok in zip(f, s, v) if ok]


def pitch_praat(frames, sample_rate, threshold=0.2, silence_threshold=0.03,
                voicing_threshold=0.45, octave_cost=0.01, octave_jump_cost=0.35,
                voiced_unvoiced_cost=0.14, fmin=60.0, fmax=600.0,
                max_candidates: int = 32, local_intensity=None):
    """The Praat-complete signature the reference's stale 8-arg callers imply
    (benches/periodic.rs:39, examples/formant_extraction/src/main.rs:76):
    candidate extraction plus the Viterbi path search with full cost set.

    frames: (F, n) pre-windowed frames. Returns (f0, strength) arrays (F,).
    """
    freq, strength, valid = pitch_frames(
        jnp.asarray(frames), float(sample_rate), threshold=threshold,
        fmin=float(fmin), fmax=float(fmax), max_candidates=max_candidates,
    )
    cfg = PathConfig(
        silence_threshold=silence_threshold,
        voicing_threshold=voicing_threshold,
        octave_cost=octave_cost,
        octave_jump_cost=octave_jump_cost,
        voiced_unvoiced_cost=voiced_unvoiced_cost,
        ceiling=float(fmax),
    )
    f0, s0 = pitch_path(freq, strength, valid, cfg, local_intensity=local_intensity)
    return np.asarray(f0), np.asarray(s0)
