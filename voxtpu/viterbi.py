"""Pitch path search: the Viterbi pass the reference stubbed out.

`PitchExtractor` in the reference carries `voiced_unvoiced_cost` and
`voicing_threshold` fields but its `next()` just returns `candidates[frame][0]`
(``/root/reference/src/periodic.rs:320-354``, `#[allow(dead_code)]`); the
stale 8-argument `pitch()` callers (benches/periodic.rs:39,
examples/formant_extraction/src/main.rs:76) reveal the intended
Praat-complete parameter set (silence threshold, voicing threshold, octave
cost, octave-jump cost). This module implements the real thing — Boersma 1993
§4's dynamic path search — as a vectorized `lax.scan` over frames with a
dense candidate-transition matrix per step, plus the stub-compatible
"take the strongest" mode for parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from voxtpu.pitch import pitch_frames

__all__ = ["PathConfig", "pitch_path", "pitch_path_host", "pitch_track", "take_best"]


@dataclass(frozen=True)
class PathConfig:
    """Praat-style path costs (Boersma 1993 defaults)."""

    silence_threshold: float = 0.03
    voicing_threshold: float = 0.45
    octave_cost: float = 0.01
    octave_jump_cost: float = 0.35
    voiced_unvoiced_cost: float = 0.14
    ceiling: float = 600.0


def take_best(freq: jax.Array, strength: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stub-compatible mode: candidates[frame][0] (periodic.rs:340-353)."""
    return freq[..., 0], strength[..., 0]


@partial(jax.jit, static_argnames=("config", "backend"))
def pitch_path(
    freq: jax.Array,
    strength: jax.Array,
    valid: jax.Array,
    config: PathConfig = PathConfig(),
    local_intensity: jax.Array | None = None,
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Viterbi path through per-frame pitch candidates.

    Args:
      freq/strength/valid: (F, C) candidate arrays (freq == 0 marks the
        unvoiced candidate).
      local_intensity: optional (F,) frame intensity relative to the global
        peak (the reference pitch()'s vestigial local_peak/global_peak args);
        drives Praat's silence-aware unvoiced strength when given.
      backend: "jnp" (unrolled lax.scan DP) / "pallas" (single-kernel DP +
        backtrace, voxtpu/ops/viterbi_pallas.py) / "pallas_interpret" /
        None = auto (pallas on TPU). Paths are bit-identical across backends
        (pinned by tests/test_pallas.py).

    Returns:
      (f0, strength) per frame, (F,) each — the maximum-score path.
    """
    freq = jnp.asarray(freq)
    strength = jnp.asarray(strength)
    F, C = freq.shape
    dt = freq.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype=dt)

    voiced = freq > 0.0

    # Local per-candidate scores (Boersma 1993 eq. 23-24).
    s_voiced = strength - config.octave_cost * jnp.log2(config.ceiling / jnp.where(voiced, freq, 1.0))
    if local_intensity is not None:
        li = jnp.asarray(local_intensity, dtype=dt)[:, None]
        s_unvoiced = config.voicing_threshold + jnp.maximum(
            0.0,
            2.0 - li / (config.silence_threshold / (1.0 + config.voicing_threshold)),
        )
    else:
        s_unvoiced = strength
    local = jnp.where(voiced, s_voiced, s_unvoiced)
    local = jnp.where(valid, local, neg_inf)

    from voxtpu.backend import default_backend

    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret") and C <= 128:
        from voxtpu.ops.viterbi_pallas import viterbi_path_pallas

        path = viterbi_path_pallas(
            local,
            jnp.where(voiced, freq, 1.0),
            voiced,
            ojc=config.octave_jump_cost,
            vuc=config.voiced_unvoiced_cost,
            interpret=backend == "pallas_interpret",
        )
        f0 = jnp.take_along_axis(freq, path[:, None], axis=-1)[:, 0]
        s0 = jnp.take_along_axis(strength, path[:, None], axis=-1)[:, 0]
        return f0, s0

    # Transition cost matrix per step: (prev C, cur C).
    def trans(fp, fc):
        vp = fp > 0.0
        vc = fc > 0.0
        both = vp[:, None] & vc[None, :]
        onev = vp[:, None] ^ vc[None, :]
        jump = jnp.abs(
            jnp.log2(jnp.where(vp, fp, 1.0)[:, None] / jnp.where(vc, fc, 1.0)[None, :])
        )
        return jnp.where(
            both, config.octave_jump_cost * jump,
            jnp.where(onev, config.voiced_unvoiced_cost, 0.0),
        )

    def step(carry, xs):
        score = carry  # (C,)
        f_prev, f_cur, loc = xs
        cost = trans(f_prev, f_cur)  # (C, C)
        total = score[:, None] - cost  # (C prev, C cur)
        best_prev = jnp.argmax(total, axis=0)
        new_score = loc + jnp.max(total, axis=0)
        return new_score, best_prev

    init = local[0]
    xs = (freq[:-1], freq[1:], local[1:])
    # unroll=8: the DP steps are tiny (C,C) tile ops, so the scan is
    # loop-overhead-bound on TPU; unrolling amortizes it (~8% off the stage,
    # measured on-chip — scripts/perf_viterbi.py). Per-step math unchanged.
    final_score, backptr = jax.lax.scan(step, init, xs, unroll=8)  # (F-1, C)

    last = jnp.argmax(final_score)

    def back(carry, bp):
        c = carry
        p = bp[c]
        return p, c

    # Reverse scan over backptr rows t = F-2..0: carry enters as the chosen
    # candidate of frame t+1, emits it at position t, and exits as frame t's
    # candidate — so ys == path[1:] and the final carry is path[0].
    first, path_tail = jax.lax.scan(back, last, backptr, reverse=True, unroll=8)
    path = jnp.concatenate([first[None], path_tail])

    f0 = jnp.take_along_axis(freq, path[:, None], axis=-1)[:, 0]
    s0 = jnp.take_along_axis(strength, path[:, None], axis=-1)[:, 0]
    return f0, s0


def pitch_path_host(
    freq,
    strength,
    valid,
    config: PathConfig = PathConfig(),
    local_intensity=None,
):
    """NumPy twin of `pitch_path` for host-side path search.

    The whole-recording DP is an O(F*C^2) scalar job (~300k flops for a
    3 s clip) — running it on device would force one compiled shape per
    recording length, which is exactly what the serving daemon's bucket
    ladder exists to avoid, and padding the DP is NOT neutral (the
    backtrace starts at the last frame, and a voiced candidate at the last
    real frame pays voiced_unvoiced_cost into a zero-padded unvoiced tail).
    Same op order and first-win argmax tie semantics as the device path;
    equality is pinned in tests/test_viterbi.py.

    Returns (f0, strength) per frame, (F,) each.
    """
    freq = np.asarray(freq)
    strength = np.asarray(strength)
    valid = np.asarray(valid)
    F, C = freq.shape
    dt = freq.dtype
    voiced = freq > 0.0
    fs = np.where(voiced, freq, dt.type(1.0))

    s_voiced = strength - dt.type(config.octave_cost) * np.log2(
        dt.type(config.ceiling) / fs
    )
    if local_intensity is not None:
        li = np.asarray(local_intensity, dtype=dt)[:, None]
        s_unvoiced = dt.type(config.voicing_threshold) + np.maximum(
            dt.type(0.0),
            dt.type(2.0)
            - li / dt.type(config.silence_threshold / (1.0 + config.voicing_threshold)),
        )
    else:
        s_unvoiced = strength
    local = np.where(voiced, s_voiced, s_unvoiced)
    local = np.where(valid, local, -np.inf).astype(dt)

    score = local[0]
    backptr = np.zeros((max(F - 1, 0), C), dtype=np.int64)
    ojc = dt.type(config.octave_jump_cost)
    vuc = dt.type(config.voiced_unvoiced_cost)
    for t in range(1, F):
        vp, vc = voiced[t - 1], voiced[t]
        both = vp[:, None] & vc[None, :]
        onev = vp[:, None] ^ vc[None, :]
        jump = np.abs(np.log2(fs[t - 1][:, None] / fs[t][None, :]))
        cost = np.where(both, ojc * jump, np.where(onev, vuc, dt.type(0.0)))
        total = score[:, None] - cost
        backptr[t - 1] = np.argmax(total, axis=0)
        score = local[t] + np.max(total, axis=0)

    path = np.zeros(F, dtype=np.int64)
    path[F - 1] = np.argmax(score)
    for t in range(F - 2, -1, -1):
        path[t] = backptr[t][path[t + 1]]
    idx = np.arange(F)
    return freq[idx, path], strength[idx, path]


def pitch_track(
    frames: jax.Array,
    sample_rate: float,
    threshold: float = 0.2,
    fmin: float = 60.0,
    fmax: float = 600.0,
    max_candidates: int = 32,
    config: PathConfig | None = None,
    use_path: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Candidates + path search in one call. frames must be pre-windowed."""
    freq, strength, valid = pitch_frames(
        frames, sample_rate, threshold=threshold, fmin=fmin, fmax=fmax,
        max_candidates=max_candidates,
    )
    if not use_path:
        return take_best(freq, strength)
    cfg = config or PathConfig(ceiling=fmax)
    return pitch_path(freq, strength, valid, cfg)
