"""McCandless formant slot tracking + the find_formants pipeline.

Reference: `EstimateFormants` (``/root/reference/src/spectrum.rs:225-334``),
`FormantExtractor` (spectrum.rs:336-369) and `find_formants`
(``/root/reference/src/lib.rs:40-116``).

TPU design: the per-frame slot-assignment procedure is branchy but operates on
tiny fixed-size state (6 slots x 32 resonances), so it transcribes exactly
into masked vector ops; the frame-to-frame dependency (estimates carry) is a
`jax.lax.scan`. Everything upstream of the scan — resampling, windowing, Burg
LPC, Laguerre roots, resonance mapping — is frame-parallel and runs batched
before the scan, so the sequential part of the whole formant pipeline is a
6-lane state update per frame, not the LPC/root math.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from voxtpu.backend import default_backend
from voxtpu.cplx import C
from voxtpu.lpc import burg
from voxtpu.resonance import resonances_from_roots, sort_and_pack_resonances
from voxtpu.roots import find_roots
from voxtpu.windows import hann

__all__ = [
    "MAX_RESONANCES",
    "MALE_FORMANT_ESTIMATES",
    "FEMALE_FORMANT_ESTIMATES",
    "estimate_formants_step",
    "formant_tracker",
    "formant_candidates",
    "find_formants",
    "resample_linear",
]

NSLOTS = 6  # FormantSlots = [Option<Resonance>; 6] (spectrum.rs:228)
MAX_RESONANCES = 32  # lib.rs:26
MALE_FORMANT_ESTIMATES = (320.0, 1440.0, 2760.0, 3200.0)  # lib.rs:27
FEMALE_FORMANT_ESTIMATES = (480.0, 1760.0, 3200.0, 3520.0)  # lib.rs:28


def _set_slot(arr: jax.Array, j: int, value: jax.Array, mask: jax.Array) -> jax.Array:
    """arr[..., j] = value where mask (batched)."""
    return arr.at[..., j].set(jnp.where(mask, value, arr[..., j]))


def estimate_formants_step(
    est_freq: jax.Array,
    est_bw: jax.Array,
    res_freq: jax.Array,
    res_bw: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One McCandless update (spectrum.rs:232-333), batched over leading axes.

    Args:
      est_freq/est_bw: (..., L) previous formant estimates.
      res_freq/res_bw: (..., R) this frame's resonances — the *full* candidate
        buffer, including any zero-valued tail entries; the reference passes
        its whole `[Resonance; 32]` buffer (lib.rs:114) and zero entries do
        participate in nearest-match and step-4 fills.

    Returns updated (est_freq, est_bw).
    """
    L = est_freq.shape[-1]
    R = res_freq.shape[-1]
    batch = est_freq.shape[:-1]
    dt = est_freq.dtype
    ns = min(L, NSLOTS)

    # --- Step 2: nearest resonance per estimate slot (spectrum.rs:234-245).
    dist = jnp.abs(res_freq[..., None, :] - est_freq[..., :ns, None])  # (..., ns, R)
    nearest = jnp.argmin(dist, axis=-1)  # first-win on ties, like the fold
    sf = jnp.take_along_axis(res_freq, nearest.reshape(batch + (ns,)), axis=-1)
    sb = jnp.take_along_axis(res_bw, nearest.reshape(batch + (ns,)), axis=-1)
    if ns < NSLOTS:
        pad = [(0, 0)] * len(batch) + [(0, NSLOTS - ns)]
        sf = jnp.pad(sf, pad)
        sb = jnp.pad(sb, pad)
    sv = jnp.broadcast_to(
        jnp.arange(NSLOTS) < ns, batch + (NSLOTS,)
    )

    # --- Step 3: dedup (spectrum.rs:250-272). Sequential over 6 slots with a
    # running pointer w to the previous surviving slot.
    w = jnp.zeros(batch, dtype=jnp.int32)
    unassigned = jnp.zeros(batch, dtype=bool)
    slot_idx = jnp.arange(NSLOTS)
    for r in range(1, NSLOTS):
        vr_f = sf[..., r]
        vr_b = sb[..., r]
        vr_valid = sv[..., r]
        sw_f = jnp.take_along_axis(sf, w[..., None], axis=-1)[..., 0]
        sw_b = jnp.take_along_axis(sb, w[..., None], axis=-1)[..., 0]
        same = vr_valid & (vr_f == sw_f) & (vr_b == sw_b)

        est_r = est_freq[..., min(r, L - 1)]
        est_w = jnp.take_along_axis(est_freq, jnp.minimum(w, L - 1)[..., None], axis=-1)[..., 0]
        closer_r = jnp.abs(vr_f - est_r) < jnp.abs(vr_f - est_w)

        inval_w = same & closer_r
        inval_r = same & ~closer_r
        sv = jnp.where((slot_idx == w[..., None]) & inval_w[..., None], False, sv)
        sv = _set_slot(sv, r, jnp.zeros(batch, dtype=bool), inval_r)
        unassigned = unassigned | same
        w = jnp.where(inval_w | (~same & vr_valid), r, w)

    # --- Step 4: fill empty slots with unassigned peaks (spectrum.rs:274-310).
    # The reference iterates j over all `resonances.len()` entries, but every
    # mutating branch requires j < 6 (or j+1 < 6), so iterations j >= 6 are
    # provably no-ops — we unroll only the live range. (This also keeps the
    # lax.scan step body small: it runs once per frame, serially.)
    for j in range(min(R, NSLOTS)):
        pf = res_freq[..., j]
        pb = res_bw[..., j]
        contains = jnp.any(sv & (sf == pf[..., None]) & (sb == pb[..., None]), axis=-1)
        can = unassigned & ~contains

        if j < NSLOTS:
            b1 = can & ~sv[..., j]
            sf = _set_slot(sf, j, pf, b1)
            sb = _set_slot(sb, j, pb, b1)
            sv = _set_slot(sv, j, jnp.ones(batch, dtype=bool), b1)
            can = can & ~b1

        if 0 < j < NSLOTS:
            b2 = can & ~sv[..., j - 1]
            # swap(j, j-1) then slots[j] = peak
            oldf, oldb, oldv = sf[..., j], sb[..., j], sv[..., j]
            sf = _set_slot(sf, j - 1, oldf, b2)
            sb = _set_slot(sb, j - 1, oldb, b2)
            sv = _set_slot(sv, j - 1, oldv, b2)
            sf = _set_slot(sf, j, pf, b2)
            sb = _set_slot(sb, j, pb, b2)
            sv = _set_slot(sv, j, jnp.ones(batch, dtype=bool), b2)
            can = can & ~b2

        if j + 1 < NSLOTS:
            b3 = can & ~sv[..., j + 1]
            oldf, oldb, oldv = sf[..., j], sb[..., j], sv[..., j]
            sf = _set_slot(sf, j + 1, oldf, b3)
            sb = _set_slot(sb, j + 1, oldb, b3)
            sv = _set_slot(sv, j + 1, oldv, b3)
            sf = _set_slot(sf, j, pf, b3)
            sb = _set_slot(sb, j, pb, b3)
            sv = _set_slot(sv, j, jnp.ones(batch, dtype=bool), b3)

    # --- Step 5: sort, None-slots first, then ascending frequency
    # (spectrum.rs:312-324). Stable, matching Rust's stable sort_by.
    key = jnp.where(sv, sf, -jnp.inf)
    order = jnp.argsort(key, axis=-1, stable=True)
    sf = jnp.take_along_axis(sf, order, axis=-1)
    sb = jnp.take_along_axis(sb, order, axis=-1)
    sv = jnp.take_along_axis(sv, order, axis=-1)

    # --- Write-back: winners (valid, freq > 0) overwrite the leading
    # estimates in order; remaining estimates keep old values
    # (spectrum.rs:326-332).
    winner = sv & (sf > 0)
    worder = jnp.argsort(~winner, axis=-1, stable=True)
    wf = jnp.take_along_axis(sf, worder, axis=-1)
    wb = jnp.take_along_axis(sb, worder, axis=-1)
    nw = jnp.sum(winner, axis=-1)
    if L > NSLOTS:
        pad = [(0, 0)] * len(batch) + [(0, L - NSLOTS)]
        wf = jnp.pad(wf, pad)
        wb = jnp.pad(wb, pad)
    take = jnp.arange(L) < nw[..., None]
    new_f = jnp.where(take, wf[..., :L], est_freq)
    new_b = jnp.where(take, wb[..., :L], est_bw)
    return new_f.astype(dt), new_b.astype(dt)


def formant_tracker(
    res_freq: jax.Array,
    res_bw: jax.Array,
    est_freq: jax.Array,
    est_bw: jax.Array,
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scan the McCandless step over the frame axis.

    Reference: `FormantExtractor` iterator (spectrum.rs:336-369); the carry is
    the estimates vector, outputs are the per-frame estimate snapshots.

    Args:
      res_freq/res_bw: (F, R) per-frame resonances.
      est_freq/est_bw: (L,) starting estimates.
      backend: "jnp" (lax.scan of masked vector ops), "pallas" (single-kernel
        scan with register-resident state — ~100x fewer per-frame dispatches),
        or "pallas_interpret" for CPU equivalence tests. Default: pallas on
        TPU, jnp elsewhere.

    Returns (F, L) tracked formant frequencies and bandwidths.
    """
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from voxtpu.ops.formant_scan_pallas import mccandless_scan_pallas

        return mccandless_scan_pallas(
            res_freq, res_bw, est_freq, est_bw,
            interpret=backend == "pallas_interpret",
        )

    def step(carry, frame):
        ef, eb = carry
        rf, rb = frame
        ef, eb = estimate_formants_step(ef, eb, rf, rb)
        return (ef, eb), (ef, eb)

    # Tie the carry to the input data so its device-variance matches under
    # shard_map (a shard-invariant carry fails scan's vma check).
    est_freq = est_freq + 0.0 * res_freq[0, 0]
    est_bw = est_bw + 0.0 * res_bw[0, 0]
    (_, _), (freqs, bws) = jax.lax.scan(step, (est_freq, est_bw), (res_freq, res_bw))
    return freqs, bws


def formant_tracker_batched(
    res_freq: jax.Array,
    res_bw: jax.Array,
    est_freq: jax.Array,
    est_bw: jax.Array,
    backend: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Track a batch of files in ONE trace: res_* (files, F, R) -> (files, F, L).

    Each file's carry starts from the seed estimates (per-recording state,
    spectrum.rs:336-341). The jnp backend vmaps the scan over the files axis;
    the pallas backend folds files into the frame axis and resets the carry at
    file boundaries inside the kernel — either way, compile size is constant
    in files-per-batch (VERDICT r2 #7: the old per-file Python loop traced
    the scan once per file index).
    """
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from voxtpu.ops.formant_scan_pallas import mccandless_scan_pallas

        files, F, R = res_freq.shape
        f, b = mccandless_scan_pallas(
            res_freq.reshape(files * F, R), res_bw.reshape(files * F, R),
            est_freq, est_bw,
            interpret=backend == "pallas_interpret", file_len=F,
        )
        L = f.shape[-1]
        return f.reshape(files, F, L), b.reshape(files, F, L)
    return jax.vmap(
        lambda f, b: formant_tracker(f, b, est_freq, est_bw, backend="jnp")
    )(res_freq, res_bw)


def resample_linear(x: jax.Array, ratio: float, out_len: int) -> jax.Array:
    """Linear-interpolation resampling, matching `sample::interpolate::Linear`
    + `Converter::scale_sample_hz` as used in lib.rs:57-64.

    Output sample k sits at input position k/ratio; positions past the end
    interpolate toward equilibrium (0), as `signal::from_iter` yields zeros
    after exhaustion.
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    pos = jnp.arange(out_len, dtype=x.dtype) / jnp.asarray(ratio, dtype=x.dtype)
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(x.dtype)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, 2)]
    xp = jnp.pad(x, pad)
    left = jnp.take(xp, i0, axis=-1)
    right = jnp.take(xp, i0 + 1, axis=-1)
    return left + (right - left) * frac


def resample_sinc(
    x: jax.Array, ratio: float, out_len: int, depth: int = 50
) -> jax.Array:
    """Bandlimited windowed-sinc resampling — the reference example's
    commented-out `Sinc` interpolator variant
    (examples/formant_extraction/src/main.rs:48-49; the code path never
    executes there, so no bit-level parity target exists). Semantics follow
    the textbook/Praat bandlimited resampler: each output sample is a
    Hann-windowed sinc sum over `depth` source taps per side, with the sinc
    cutoff at the LOWER of the source/target Nyquist frequencies — so
    downsampling anti-aliases (which `resample_linear` does not) and
    upsampling is a near-ideal interpolation.

    1-D signals only (whole-recording ingest; per-frame analysis resampling
    stays `resample_linear`, the semantics the reference actually executes).
    """
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError("resample_sinc expects a 1-D signal")
    n = x.shape[-1]
    dt = x.dtype
    r = jnp.asarray(ratio, dt)
    pos = jnp.arange(out_len, dtype=dt) / r  # output k at source position k/ratio
    i0 = jnp.floor(pos).astype(jnp.int32)
    cutoff = jnp.minimum(r, jnp.asarray(1.0, dt))  # <1 on downsample
    m = jnp.arange(-depth + 1, depth + 1, dtype=jnp.int32)
    idx = i0[:, None] + m[None, :]  # (out_len, 2*depth)
    valid = (idx >= 0) & (idx < n)
    xi = jnp.take(x, jnp.clip(idx, 0, n - 1))
    d = pos[:, None] - idx.astype(dt)  # tap offset in source samples
    ds = d * cutoff  # scaled: sinc bandwidth = cutoff * source Nyquist
    sinc = jnp.where(ds == 0.0, 1.0, jnp.sin(jnp.pi * ds) / (jnp.pi * ds))
    hann = jnp.where(
        jnp.abs(d) < depth, 0.5 + 0.5 * jnp.cos(jnp.pi * d / depth), 0.0
    )
    taps = jnp.where(valid, xi * sinc * hann, 0.0)
    return (cutoff * jnp.sum(taps, axis=-1)).astype(dt)


def formant_candidates(
    frames: jax.Array,
    sample_rate: float,
    n_coeffs: int,
    resample_ratio: float = 1.0,
    max_resonances: int = MAX_RESONANCES,
    polish: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The frame-parallel half of `find_formants` (lib.rs:40-110): resample ->
    Hann window -> Burg LPC -> monic polynomial -> Laguerre roots -> sorted
    resonance buffer. No cross-frame state — safe to shard/batch arbitrarily;
    the sequential McCandless carry (`formant_tracker`) consumes the result.

    polish: in f32 (the TPU fast path) refine the roots with a compensated
    Newton pass against the undeflated polynomial (`roots.polish_roots`),
    recovering the accuracy Laguerre-deflation drift loses — measured 2.6 Hz
    -> sub-0.1 Hz worst-case formant error at the bench config, beating the
    reference's own 1 Hz golden bar (scripts/perf_root_polish.py, PARITY.md).
    f64 parity mode never polishes (reference-exact semantics are the point
    there), so the quirk-exact goldens are untouched.

    Returns (rfreq (F, R), rbw (F, R), status (F,)).
    """
    frames = jnp.asarray(frames)
    if frames.ndim == 1:
        frames = frames[None]
    F, n = frames.shape
    dt = frames.dtype

    if resample_ratio != 1.0:
        out_len = int(math.ceil(resample_ratio * n))
        buf = resample_linear(frames, resample_ratio, out_len)
    else:
        out_len = n
        buf = frames

    window = jnp.asarray(hann(out_len), dtype=dt)
    buf = buf * window

    coeffs, status = burg(buf, n_coeffs)

    # Monic complex polynomial [1, a1..an] reversed (lib.rs:76-91):
    # index k holds the coefficient of z^k; top coefficient is 1.
    ones = jnp.ones((F, 1), dtype=dt)
    poly_re = jnp.concatenate([coeffs[:, ::-1], ones], axis=-1)
    poly_im = jnp.zeros_like(poly_re)

    roots, _count, rstatus = find_roots(C(poly_re, poly_im))
    status = status | rstatus
    if polish and dt == jnp.float32:
        from voxtpu.roots import polish_roots

        roots = polish_roots(C(poly_re, poly_im), roots)

    rfreq, rbw, valid = resonances_from_roots(roots, sample_rate, require_im_positive=True)
    rfreq, rbw = sort_and_pack_resonances(rfreq, rbw, valid, max_resonances)
    return rfreq, rbw, status


def find_formants(
    frames: jax.Array,
    sample_rate: float,
    n_coeffs: int,
    resample_ratio: float = 1.0,
    estimates=MALE_FORMANT_ESTIMATES,
    estimate_bandwidth: float = 1.0,
    estimate_bws=None,
    max_resonances: int = MAX_RESONANCES,
    polish: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Full formant pipeline over the frames of one recording.

    Reference: `vox_box::find_formants` (lib.rs:40-116), which the caller
    loops per frame, threading the estimates buffer through. Here the
    frame-parallel work (resample -> Hann window -> Burg LPC -> monic
    polynomial -> Laguerre roots -> resonances) runs batched over all frames
    at once; only the 6-slot McCandless update scans sequentially.

    Args:
      frames: (F, n) frames of one file (rectangular framing; windowing
        happens inside, as in lib.rs:66-70).
      sample_rate: sample rate *after* resampling is NOT applied — the
        reference passes the original rate and the resample only changes the
        analysis bandwidth implicitly (tests/lib.rs:37, main.rs:79 pass the
        new rate with ratio!=1; pass whatever the reference caller passes).
      n_coeffs: Burg LPC order.
      resample_ratio: linear resample ratio (1.0 = skip, exact reference
        check lib.rs:57).

    Returns:
      (freqs (F, L), bws (F, L), status (F,)) — per-frame tracked formants
      and status bitmask.
    """
    rfreq, rbw, status = formant_candidates(
        frames, sample_rate, n_coeffs,
        resample_ratio=resample_ratio, max_resonances=max_resonances,
        polish=polish,
    )
    dt = rfreq.dtype

    est_f = jnp.asarray(estimates, dtype=dt)
    if estimate_bws is not None:
        est_b = jnp.asarray(estimate_bws, dtype=dt)
    else:
        est_b = jnp.full_like(est_f, estimate_bandwidth)
    freqs, bws = formant_tracker(rfreq, rbw, est_f, est_b)
    return freqs, bws, status
