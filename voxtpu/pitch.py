"""Boersma (1993) autocorrelation pitch detection, batched over frames.

Reference: `Pitched::pitch` (``/root/reference/src/periodic.rs:377-456``), the
flagship per-frame routine (13.2 ms/frame on the reference's own bench,
benches/periodic.rs:23-25).

TPU design — the whole frame batch moves through one fused program:
  1. quirk-exact FFT autocorrelation (voxtpu.autocorr) -> normalize by max
     -> divide by the analytic Hann lag window -> zero-pad to 2n;
  2. local maxima over the first floor(n/2) lags as one shifted-compare mask;
  3. parabolic frequency per maximum (vectorized), band filter;
  4. candidate compaction to a fixed capacity (lag order, like the reference's
     push order);
  5. Brent + depth-1200 sinc refinement (the Pallas kernel,
     ops/refine_pallas.py, or a vector-loop jnp twin). The reference also
     computes a depth-30 strength before refining (periodic.rs:429-435) but
     overwrites it with the Brent value (periodic.rs:441-450) — dead, so the
     production path skips that eval (the turbo `refine="parabolic"` mode is
     where it is live);
  6. the unvoiced candidate (freq 0, strength = threshold) appended, then a
     batched sort by strength descending (stable, matching Rust sort_by).

`local_peak`/`global_peak` are accepted-but-unused in the reference
(periodic.rs:357, 396); the Praat-complete voicing parameters the stale 8-arg
callers reveal (benches/periodic.rs:39) live in voxtpu.viterbi instead.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from voxtpu.autocorr import autocorrelate
from voxtpu.backend import default_backend
from voxtpu.sinc import improve_extremum_sinc, interpolate_sinc
from voxtpu.windows import hanning_lag

__all__ = ["pitch_frames", "best_pitch"]

INTERPOLATION_DEPTH = 0.5  # periodic.rs:413
STRENGTH_SINC_DEPTH = 30  # periodic.rs:433
REFINE_SINC_DEPTH = 1200  # periodic.rs:444


def _sinc_edge_returns(strn, self_lag, pos, nx, bi):
    """interpolate_sinc's outer early returns (periodic.rs:39-40), applied on
    top of the Pallas strength eval in parabolic mode: x > nx reads
    y[offset + nx - 1] (== lag bi-1 here, offset = -bi-1), x < 0 reads y[0] —
    the exact indices the jnp twin (sinc.py) and the oracle use."""
    strn = jnp.where(pos > nx, self_lag[:, bi - 1][:, None], strn)
    return jnp.where(pos < 0.0, self_lag[:, 0][:, None], strn)


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "fmin", "fmax", "max_candidates", "threshold", "refine_backend",
        "refine_depth", "refine",
    ),
)
def pitch_frames(
    frames: jax.Array,
    sample_rate: float,
    threshold: float = 0.2,
    local_peak=None,
    global_peak=None,
    fmin: float = 50.0,
    fmax: float = 600.0,
    max_candidates: int = 32,
    refine_backend: str | None = None,
    precomputed_ac: jax.Array | None = None,
    refine_depth: int | None = None,
    refine: str = "sinc",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pitch candidates for a batch of (already windowed) frames.

    Args:
      frames: (B, n) windowed frames (the reference assumes pre-windowed
        input, periodic.rs:383-384).
      sample_rate, threshold, fmin, fmax: as the reference's pitch() args.
      local_peak/global_peak: accepted for signature parity and ignored, as in
        the reference (periodic.rs:357, 396 — vestigial Praat intensity
        params). The real voicing decision lives in voxtpu.viterbi.
      max_candidates: fixed candidate capacity per frame. The reference keeps
        every band-passed local maximum; voiced speech yields well under 32.
        If a frame has more, the lowest-lag ones win (reference push order).
      refine_depth: max sinc depth for the Brent refinement pass. None =
        the reference's hardcoded 1200 (periodic.rs:445; the low clip makes
        the effective depth lag+1, so the taps span the whole buffer
        prefix). Lower values (e.g. Praat's fast sinc70) cap the tap window
        — a documented accuracy/speed knob (PARITY.md), NOT reference
        semantics.
      refine: "sinc" (default — the reference's second pass: Brent over the
        windowed-sinc interpolant, periodic.rs:440-450) or "parabolic"
        (first-pass-only turbo: keep the parabolic-vertex frequency and use
        the depth-30 sinc strength, i.e. the reference's own pass-1
        candidate set, periodic.rs:420-438, skipping the second pass —
        a documented speed mode, PARITY.md).

    Returns:
      (freq, strength, valid): each (B, max_candidates + 1), sorted by
      strength descending per frame; the unvoiced candidate (0, threshold)
      occupies one lane. Invalid (unused capacity) lanes have valid=False and
      strength=-inf ordering (they sort last).
    """
    frames = jnp.asarray(frames)
    if frames.ndim == 1:
        frames = frames[None]
    B, n = frames.shape
    dt = frames.dtype
    C = max_candidates

    # --- lag-domain normalized autocorrelation (periodic.rs:400-411)
    # NOTE r4 (VERDICT r3 #9): this whole pre-stage block — through the band
    # filter — also exists as ONE bit-identical Pallas kernel
    # (ops/pitch_pre_pallas.py, equivalence-pinned in tests/test_pallas.py),
    # but it measured FLAT on-chip (s2 37.7 -> 38.2 ms, s3-production
    # 30.3 -> 31.1 ms @5121 frames, scripts/perf_pitch_stages.py): XLA
    # already fuses these elementwise/shifted passes well. The jnp block
    # stays the production path; the kernel is kept as measured evidence.
    self_lag = autocorrelate(frames, n) if precomputed_ac is None else precomputed_ac
    self_lag = self_lag / jnp.max(jnp.abs(self_lag), axis=-1, keepdims=True)
    self_lag = self_lag / jnp.asarray(hanning_lag(n), dtype=dt)
    # Degenerate (all-zero) frames normalize to 0/0 = NaN. The reference's
    # NaN lag row yields no band-passed maxima -> the unvoiced candidate
    # wins; zeroing the row reaches the same endpoint WITHOUT NaN in the
    # buffer — which matters batched: the refine kernel's 8-frame buffer
    # blocks select lanes' rows with a 0/1 matmul, and 0 * NaN = NaN would
    # poison valid neighbours (e.g. real frames sharing a block with
    # zero-padded batch frames).
    self_lag = jnp.where(jnp.isfinite(self_lag), self_lag, jnp.zeros_like(self_lag))
    self_lag = jnp.concatenate([self_lag, jnp.zeros_like(self_lag)], axis=-1)

    bi = int(math.floor(INTERPOLATION_DEPTH * n))  # brent_ixmax
    backend = refine_backend or default_backend()
    # The maxima axis has only bi-2 centers, so more capacity than that is
    # pure dead lanes (and lax.top_k rejects k > axis size): run the whole
    # pipeline at the clamped width and pad the sorted outputs back out to
    # the requested capacity at the end (invalid lanes sort last, so the
    # padding extends the tail without disturbing order).
    C_req = C
    C = min(C, bi - 2)

    # --- local maxima over self_lag[0..bi) (periodic.rs:413-417)
    seg = self_lag[:, :bi]
    is_max = (seg[:, :-2] < seg[:, 1:-1]) & (seg[:, 2:] < seg[:, 1:-1])  # centers 1..bi-2
    ix = jnp.arange(1, bi - 1)

    # --- parabolic frequency (periodic.rs:420-425)
    peak = seg[:, 1:-1]
    peak_rev = seg[:, :-2]
    peak_fwd = seg[:, 2:]
    dr = 0.5 * (peak_fwd - peak_rev)
    d2r = 2.0 * peak - (peak_rev - peak_fwd)
    freq = sample_rate / (ix.astype(dt)[None, :] + dr / d2r)

    # --- band filter (periodic.rs:439); freq == 0 passes but cannot occur
    cand = is_max & ((freq == 0.0) | ((freq > fmin) & (freq < fmax)))

    # --- compact to capacity C in lag order. top_k (O(n*C)) instead of a
    # full argsort: keys make valid candidates ascend by lag. In-band
    # candidates physically live at lags ~[sr/fmax, sr/fmin]; a generous
    # margin window covers even strongly-shifted parabolic vertices, and a
    # scalar cond falls back to the full lag range in the (degenerate) case
    # a candidate escapes it — exact either way.
    neg_inf = jnp.asarray(-jnp.inf, dt)
    ix_f = ix.astype(dt)[None, :]
    lag_lo = max(int(math.floor(sample_rate / fmax)) - 64, 1)
    lag_hi = min(int(math.ceil(sample_rate / fmin)) + 64, bi - 2)
    w0, w1 = lag_lo - 1, lag_hi  # column range for ix in [lag_lo, lag_hi]
    B_ = cand.shape[0]
    if w1 - w0 <= C:
        keys = jnp.where(cand, -ix_f, neg_inf)
        _vals, order = jax.lax.top_k(keys, C)
        cand_c = jnp.take_along_axis(cand, order, axis=-1)
        freq_c = jnp.take_along_axis(freq, order, axis=-1)
    else:
        escaped = jnp.any(cand & ((ix < lag_lo) | (ix > lag_hi))[None, :])

        def full_range(_):
            keys = jnp.where(cand, -ix_f, neg_inf)
            order = jax.lax.top_k(keys, C)[1].astype(jnp.int32)
            return (
                jnp.take_along_axis(freq, order, axis=-1),
                jnp.take_along_axis(cand, order, axis=-1),
            )

        def windowed(_):
            # Rank-compaction: cumsum gives each candidate its output slot;
            # 32 masked reduces compact freq directly — no sort (XLA top_k)
            # and no take_along_axis gather (the gather alone measured
            # ~2.3 ms @5121 frames, scripts/perf_pitch_stages.py s3 vs
            # s3 nogather). Dead lanes get freq 0; every consumer masks on
            # cand_c.
            candw = cand[:, w0:w1]
            freqw = freq[:, w0:w1]
            rank = jnp.cumsum(candw.astype(jnp.int32), axis=-1)
            sel = candw & (rank <= C)
            freq_c = jnp.stack(
                [
                    jnp.sum(jnp.where(sel & (rank == c + 1), freqw, 0.0), axis=-1)
                    for c in range(C)
                ],
                axis=-1,
            )
            nvalid = jnp.minimum(rank[:, -1], C)
            cand_c = jnp.arange(C, dtype=jnp.int32)[None, :] < nvalid[:, None]
            return freq_c, cand_c

        freq_c, cand_c = jax.lax.cond(escaped, full_range, windowed, None)

    offset = -bi - 1
    nx = bi - offset  # == 2*bi + 1

    # --- strength: sinc depth 30 at n = sr/freq - offset (periodic.rs:429-435)
    # --- refinement: Brent over sinc depth 1200 (periodic.rs:440-450)
    pos = sample_rate / freq_c - offset
    # Dead lanes get an in-range NON-integer fill: an integer fill would trip
    # the refine kernel's integer-snap branch (refine_pallas.py) on every
    # strength eval. Dead-lane outputs are masked out below either way.
    pos = jnp.where(cand_c, pos, float(bi) + 0.5)
    # Band-passed candidates satisfy sr/freq < sr/fmin, bounding the tap count.
    max_x = sample_rate / fmin - offset
    depth = REFINE_SINC_DEPTH if refine_depth is None else int(refine_depth)
    if refine == "parabolic":
        # First-pass-only turbo: the reference's pass-1 candidate set
        # (periodic.rs:420-438) — parabolic-vertex frequency, depth-30 sinc
        # strength at the vertex — without the second (Brent) pass. One cheap
        # kernel eval replaces the ~7 full-depth evals.
        if backend in ("pallas", "pallas_interpret"):
            from voxtpu.sinc import _max_effective_depth
            from voxtpu.ops.refine_pallas import brent_refine_pallas

            t30 = _max_effective_depth(offset, nx, STRENGTH_SINC_DEPTH, max_x) + 1
            _, strn = brent_refine_pallas(
                self_lag, pos, cand_c, offset, STRENGTH_SINC_DEPTH, t30 - 1,
                max_base=offset + int(math.floor(max_x)) + 3,
                iters=0,
                interpret=backend == "pallas_interpret",
            )
            strn = _sinc_edge_returns(strn, self_lag, pos, nx, bi)
        else:
            strn = interpolate_sinc(
                self_lag, offset, nx, pos, STRENGTH_SINC_DEPTH, max_x=max_x
            )
        strn = jnp.where(strn > 1.0, 1.0 / strn, strn)
        freq_r = freq_c
        strength_r = strn
    elif backend in ("pallas", "pallas_interpret"):
        from voxtpu.sinc import _max_effective_depth
        from voxtpu.ops.refine_pallas import brent_refine_pallas

        taps = _max_effective_depth(offset, nx, depth, max_x + 1.0) + 1
        xb, fb = brent_refine_pallas(
            self_lag, pos, cand_c, offset, depth, taps - 1,
            max_base=offset + int(math.floor(max_x + 1.0)) + 3,
            interpret=backend == "pallas_interpret",
        )
        # improve_extremum's edge selects (periodic.rs:193-194).
        y_last = self_lag[:, nx - 1][:, None]
        at_zero = pos == 0.0
        past_end = pos >= nx
        xmid = jnp.where(at_zero, 0.0, jnp.where(past_end, float(nx), xb))
        ymid = jnp.where(at_zero, self_lag[:, 0][:, None], jnp.where(past_end, y_last, fb))
    else:
        xmid, ymid = improve_extremum_sinc(
            self_lag, offset, nx, pos, depth, max_x=max_x + 1.0,
            lane_mask=cand_c, backend=backend,
        )
    if refine != "parabolic":
        # The reference also computes a depth-30 strength at pos here
        # (periodic.rs:429-435) but immediately overwrites it with the Brent
        # maximum's value (the second map, periodic.rs:441-450) — the eval is
        # dead, so the production path skips it (it used to ride fused in the
        # kernel; measured win in PERFORMANCE.md).
        xmid = xmid + offset
        ymid = jnp.where(ymid > 1.0, 1.0 / ymid, ymid)
        freq_r = sample_rate / xmid
        strength_r = ymid

    # --- append unvoiced candidate + sort by strength desc (periodic.rs:452-453)
    freq_all = jnp.concatenate(
        [jnp.where(cand_c, freq_r, 0.0), jnp.zeros((B, 1), dtype=dt)], axis=-1
    )
    strength_all = jnp.concatenate(
        [jnp.where(cand_c, strength_r, -jnp.inf), jnp.full((B, 1), threshold, dtype=dt)],
        axis=-1,
    )
    valid_all = jnp.concatenate([cand_c, jnp.ones((B, 1), dtype=bool)], axis=-1)

    # One variadic stable sort carrying the three payloads — permutation-
    # identical to stable argsort(-strength) + three take_along_axis gathers
    # (argsort IS a stable lax.sort underneath), but the gathers cost ~4 ms
    # at 5121 frames on v5e (scripts/perf_pitch_stages.py s7 argsort vs
    # laxsort) while sort payloads ride the same sort network for free.
    _key, freq_s, strength_s, valid_s = jax.lax.sort(
        (-strength_all, freq_all, strength_all, valid_all),
        dimension=-1, is_stable=True, num_keys=1,
    )
    strength_s = jnp.where(valid_s, strength_s, 0.0)
    if C_req > C:
        pad = [(0, 0), (0, C_req - C)]
        freq_s = jnp.pad(freq_s, pad)
        strength_s = jnp.pad(strength_s, pad)
        valid_s = jnp.pad(valid_s, pad)
    return freq_s, strength_s, valid_s


def best_pitch(freq: jax.Array, strength: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Stub-compatible 'take the strongest candidate' (PitchExtractor's
    unimplemented path search just returns candidates[frame][0],
    periodic.rs:340-353)."""
    return freq[..., 0], strength[..., 0]
