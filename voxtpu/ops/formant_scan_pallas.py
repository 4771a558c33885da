"""Pallas kernel: the McCandless formant-slot scan.

The only sequential computation in the framework (spectrum.rs:232-333 per
frame, carried estimates). In plain XLA, `lax.scan` executes the ~hundreds of
tiny slot ops of each step as individually-scheduled HLO ops — ~100+ us per
frame, linear in audio length. Here the whole scan runs inside one kernel:
slot state lives in vector registers, each frame's resonance row is DMA'd
HBM->VMEM on demand, and a frame step is ~600 straight-line VPU ops (~1 us).

Layout: lanes hold slots/resonances — res rows are (1, 128) tiles with 32
live lanes, slot state (1, 128) with 6 live lanes (NSLOTS), estimates (1, 128)
with L live lanes. Scalar extraction is a masked lane reduce; all the
branchy reference logic (nearest-match, dedup with the moving `w` pointer,
step-4 fills, the stable slot sort, winner write-back) is implemented as
masked lane selects, preserving the exact semantics of
voxtpu.formants.estimate_formants_step (pinned by interpret-mode tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NSLOTS = 6
BIG = 3.0e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(est_f0_ref, est_b0_ref, rf_hbm, rb_hbm, outf_hbm, outb_hbm,
            rf_scr, rb_scr, of_scr, ob_scr, sems, *, F: int, L: int, R: int):
    dt = est_f0_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    res_mask = lane < R
    slot_mask = lane < NSLOTS

    def ext(v, i):
        """Extract lane i of a (1, LANES) vector as a scalar."""
        return jnp.sum(jnp.where(lane == i, v, 0.0))

    def exti(v, i):
        return jnp.sum(jnp.where(lane == i, v, 0))

    def put(v, i, value):
        """Set lane i (static or traced) to scalar value."""
        return jnp.where(lane == i, value, v)

    def frame_step(it, carry):
        est_f, est_b = carry  # (1, LANES), L live lanes

        cp = pltpu.make_async_copy(rf_hbm.at[pl.ds(it, 1), :], rf_scr, sems.at[0])
        cp.start()
        cp2 = pltpu.make_async_copy(rb_hbm.at[pl.ds(it, 1), :], rb_scr, sems.at[1])
        cp2.start()
        cp.wait()
        cp2.wait()
        rfreq = rf_scr[:]
        rbw = rb_scr[:]

        # --- Step 2: nearest resonance per estimate slot.
        sf = jnp.zeros((1, LANES), dtype=dt)
        sb = jnp.zeros((1, LANES), dtype=dt)
        sv = jnp.zeros((1, LANES), dtype=dt)  # 0/1 slot validity
        for s in range(min(L, NSLOTS)):
            est_s = ext(est_f, s)
            dist = jnp.where(res_mask, jnp.abs(rfreq - est_s), BIG)
            dmin = jnp.min(dist)
            imin = jnp.min(jnp.where(dist == dmin, lane, LANES))  # first win
            sf = put(sf, s, ext(rfreq, imin))
            sb = put(sb, s, ext(rbw, imin))
            sv = put(sv, s, 1.0)

        # --- Step 3: dedup with moving pointer w.
        w = jnp.int32(0)
        unassigned = jnp.asarray(0.0, dtype=dt)
        for r in range(1, NSLOTS):
            vr_f = ext(sf, r)
            vr_b = ext(sb, r)
            vr_valid = ext(sv, r) > 0.5
            sw_f = ext(sf, w)
            sw_b = ext(sb, w)
            same = vr_valid & (vr_f == sw_f) & (vr_b == sw_b)

            est_r = ext(est_f, min(r, L - 1))
            est_w = ext(est_f, jnp.minimum(w, L - 1))
            closer_r = jnp.abs(vr_f - est_r) < jnp.abs(vr_f - est_w)

            inval_w = same & closer_r
            inval_r = same & ~closer_r
            sv = jnp.where((lane == w) & inval_w, 0.0, sv)
            sv = jnp.where((lane == r) & inval_r, 0.0, sv)
            unassigned = jnp.maximum(unassigned, same.astype(dt))
            w = jnp.where(inval_w | (~same & vr_valid), r, w)

        # --- Step 4: fill empty slots with unassigned peaks (j < 6 only;
        # j >= 6 iterations are provably no-ops, see voxtpu/formants.py).
        for j in range(min(R, NSLOTS)):
            pf = ext(rfreq, j)
            pb = ext(rbw, j)
            contains = jnp.max(
                jnp.where((sv > 0.5) & (sf == pf) & (sb == pb), 1.0, 0.0)
            ) > 0.5
            can = (unassigned > 0.5) & ~contains

            b1 = can & (ext(sv, j) < 0.5)
            sf = jnp.where((lane == j) & b1, pf, sf)
            sb = jnp.where((lane == j) & b1, pb, sb)
            sv = jnp.where((lane == j) & b1, 1.0, sv)
            can = can & ~b1

            if j > 0:
                b2 = can & (ext(sv, j - 1) < 0.5)
                oldf, oldb, oldv = ext(sf, j), ext(sb, j), ext(sv, j)
                sf = jnp.where((lane == j - 1) & b2, oldf, sf)
                sb = jnp.where((lane == j - 1) & b2, oldb, sb)
                sv = jnp.where((lane == j - 1) & b2, oldv, sv)
                sf = jnp.where((lane == j) & b2, pf, sf)
                sb = jnp.where((lane == j) & b2, pb, sb)
                sv = jnp.where((lane == j) & b2, 1.0, sv)
                can = can & ~b2

            if j + 1 < NSLOTS:
                b3 = can & (ext(sv, j + 1) < 0.5)
                oldf, oldb, oldv = ext(sf, j), ext(sb, j), ext(sv, j)
                sf = jnp.where((lane == j + 1) & b3, oldf, sf)
                sb = jnp.where((lane == j + 1) & b3, oldb, sb)
                sv = jnp.where((lane == j + 1) & b3, oldv, sv)
                sf = jnp.where((lane == j) & b3, pf, sf)
                sb = jnp.where((lane == j) & b3, pb, sb)
                sv = jnp.where((lane == j) & b3, 1.0, sv)

        # --- Step 5: stable sort of the 6 slots, invalid (None) first, then
        # ascending frequency — unrolled insertion sort (stable).
        key = jnp.where(slot_mask & (sv > 0.5), sf, -BIG)
        for i in range(1, NSLOTS):
            for j in range(i, 0, -1):
                kj = ext(key, j)
                kjm = ext(key, j - 1)
                swap = kjm > kj
                fj, fjm = ext(sf, j), ext(sf, j - 1)
                bj, bjm = ext(sb, j), ext(sb, j - 1)
                vj, vjm = ext(sv, j), ext(sv, j - 1)
                sf = jnp.where((lane == j) & swap, fjm, jnp.where((lane == j - 1) & swap, fj, sf))
                sb = jnp.where((lane == j) & swap, bjm, jnp.where((lane == j - 1) & swap, bj, sb))
                sv = jnp.where((lane == j) & swap, vjm, jnp.where((lane == j - 1) & swap, vj, sv))
                key = jnp.where((lane == j) & swap, kjm, jnp.where((lane == j - 1) & swap, kj, key))

        # --- Write-back: winners (valid, freq > 0) into leading estimates.
        count = jnp.int32(0)
        for p in range(NSLOTS):
            is_w = (ext(sv, p) > 0.5) & (ext(sf, p) > 0.0)
            tgt = count
            upd = is_w & (tgt < L)
            est_f = jnp.where((lane == tgt) & upd, ext(sf, p), est_f)
            est_b = jnp.where((lane == tgt) & upd, ext(sb, p), est_b)
            count = count + is_w.astype(jnp.int32)

        of_scr[:] = est_f
        ob_scr[:] = est_b
        cp3 = pltpu.make_async_copy(of_scr, outf_hbm.at[pl.ds(it, 1), :], sems.at[2])
        cp3.start()
        cp4 = pltpu.make_async_copy(ob_scr, outb_hbm.at[pl.ds(it, 1), :], sems.at[3])
        cp4.start()
        cp3.wait()
        cp4.wait()
        return est_f, est_b

    est_f = est_f0_ref[:]
    est_b = est_b0_ref[:]
    jax.lax.fori_loop(0, F, frame_step, (est_f, est_b))


@functools.partial(jax.jit, static_argnames=("interpret",))
def mccandless_scan_pallas(
    res_freq: jax.Array,
    res_bw: jax.Array,
    est_freq: jax.Array,
    est_bw: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scan the McCandless step over frames. res_* (F, R); est_* (L,).

    Returns (freqs, bws), each (F, L) — the per-frame estimate snapshots
    (FormantExtractor semantics, spectrum.rs:336-369).
    """
    F, R = res_freq.shape
    L = est_freq.shape[-1]
    dt = res_freq.dtype
    if R > LANES:
        raise ValueError(f"R={R} exceeds lane capacity {LANES}")

    rf = jnp.pad(res_freq, [(0, 0), (0, LANES - R)])
    rb = jnp.pad(res_bw, [(0, 0), (0, LANES - R)])
    ef0 = jnp.pad(est_freq[None, :], [(0, 0), (0, LANES - L)])
    eb0 = jnp.pad(est_bw[None, :], [(0, 0), (0, LANES - L)])

    kernel = functools.partial(_kernel, F=F, L=L, R=R)
    outf, outb = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, LANES), dt),
            jax.ShapeDtypeStruct((F, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, LANES), dt),
            pltpu.VMEM((1, LANES), dt),
            pltpu.VMEM((1, LANES), dt),
            pltpu.VMEM((1, LANES), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(ef0, eb0, rf, rb)

    return outf[:, :L], outb[:, :L]
