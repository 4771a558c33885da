"""Pallas kernel: the McCandless formant-slot scan.

The only sequential computation in the framework (spectrum.rs:232-333 per
frame, carried estimates). In plain XLA, `lax.scan` executes the ~hundreds of
tiny slot ops of each step as individually-scheduled HLO ops — ~100+ us per
frame, linear in audio length. Here the whole scan runs inside one kernel.

Design notes:
- Frame resonance rows stream HBM->VMEM in blocks of `TBLK` frames (one DMA
  per block instead of per frame), outputs accumulate in a VMEM block and
  stream back the same way.
- The 6 formant slots and L estimates live as *individual scalars* (Python
  lists of traced values on the scalar unit), not vectors: the reference's
  branchy logic (nearest-match, dedup with the moving `w` pointer, step-4
  fills, the stable slot sort, winner write-back) is straight-line scalar
  select code, with exactly one vector op per frame step per estimate slot
  (the 128-lane nearest-resonance argmin reduce).
- Semantics are pinned to voxtpu.formants.estimate_formants_step by
  interpret-mode tests (exact equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NSLOTS = 6
TBLK = 128  # frames per DMA block
BIG = 3.0e38


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _sel(i, options):
    """Select options[i] for traced scalar i from a static list (scalar unit)."""
    out = options[0]
    for k in range(1, len(options)):
        out = jnp.where(i == k, options[k], out)
    return out


def _kernel(est_f0_ref, est_b0_ref, rf_hbm, rb_hbm, outf_hbm, outb_hbm,
            rf_scr, rb_scr, of_scr, ob_scr, sems, *, F: int, L: int, R: int,
            file_len: int):
    dt = rf_scr.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    res_mask = lane < R
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    res_mask8 = lane8 < R
    n_blocks = (F + TBLK - 1) // TBLK

    # Starting estimates as 2L scalars — the carry seed, also re-applied at
    # every file boundary when several files are folded along the frame axis
    # (file_len < F): each recording's tracker must start from the seed, never
    # from the previous file's final estimates (spectrum.rs:336-341 is
    # strictly per-recording state).
    ef_row = est_f0_ref[:]
    eb_row = est_b0_ref[:]
    est0 = tuple(
        jnp.sum(jnp.where(lane == i, ef_row, 0.0)) for i in range(L)
    ) + tuple(jnp.sum(jnp.where(lane == i, eb_row, 0.0)) for i in range(L))

    def block_loop(blk, est):
        # est: flat tuple of 2L scalars (estimate freqs then bandwidths) —
        # scalar-unit carry, no vector extract/rebuild per frame.

        # Stream this block of frames in.
        cp = pltpu.make_async_copy(
            rf_hbm.at[pl.ds(blk * TBLK, TBLK), :], rf_scr, sems.at[0]
        )
        cp.start()
        cp2 = pltpu.make_async_copy(
            rb_hbm.at[pl.ds(blk * TBLK, TBLK), :], rb_scr, sems.at[1]
        )
        cp2.start()
        cp.wait()
        cp2.wait()

        def frame_step(t, est):
            ef = list(est[:L])
            eb = list(est[L:])

            rfreq = rf_scr[pl.ds(t, 1), :]  # (1, LANES)
            rbw = rb_scr[pl.ds(t, 1), :]

            # --- Step 2: nearest resonance for all estimate slots at once —
            # one (8, 128) tile pass instead of per-slot reduces.
            ecol = jnp.zeros((8, 1), dtype=dt)
            for i in range(min(L, NSLOTS)):
                ecol = jnp.where(row8 == i, ef[i], ecol)
            dist = jnp.where(res_mask8, jnp.abs(rfreq - ecol), BIG)  # (8,128)
            dmin = jnp.min(dist, axis=1, keepdims=True)
            first = jnp.min(
                jnp.where(dist == dmin, lane8, LANES), axis=1, keepdims=True
            )  # (8, 1) first-win argmin
            sel = lane8 == first
            sfcol = jnp.sum(jnp.where(sel, rfreq, 0.0), axis=1, keepdims=True)
            sbcol = jnp.sum(jnp.where(sel, rbw, 0.0), axis=1, keepdims=True)

            # Slot validity is encoded as a sentinel: sf[k] == -BIG means
            # "slot k invalid" (real slot freqs are always finite and >= 0, so
            # the sentinel never collides) — this removes the separate sv[]
            # boolean array and every `& sv` term from the scalar chains,
            # which are the kernel's bottleneck (the VPU sits idle: removing
            # 12 vector reduces/frame measured flat, scripts/perf_formant_scan).
            sf = [jnp.asarray(-BIG, dt)] * NSLOTS
            sb = [jnp.asarray(0.0, dt)] * NSLOTS
            for s in range(min(L, NSLOTS)):
                sf[s] = jnp.sum(jnp.where(row8 == s, sfcol, 0.0))
                sb[s] = jnp.sum(jnp.where(row8 == s, sbcol, 0.0))

            # --- Step 3: dedup with moving pointer w (scalar).
            w = jnp.int32(0)
            unassigned = jnp.asarray(False)
            for r in range(1, NSLOTS):
                sw_f = _sel(w, sf[:r])
                sw_b = _sel(w, sb[:r])
                valid_r = sf[r] > -BIG
                same = valid_r & (sf[r] == sw_f) & (sb[r] == sw_b)
                est_r = ef[min(r, L - 1)]
                est_w = _sel(jnp.minimum(w, L - 1), ef)
                closer_r = jnp.abs(sf[r] - est_r) < jnp.abs(sf[r] - est_w)
                inval_w = same & closer_r
                inval_r = same & ~closer_r
                for k in range(r):
                    sf[k] = jnp.where(inval_w & (w == k), -BIG, sf[k])
                sf[r] = jnp.where(inval_r, -BIG, sf[r])
                unassigned = unassigned | same
                # (~same & valid_r) is unchanged by the inval_r update above:
                # when inval_r, same is True, so the term is False either way.
                w = jnp.where(inval_w | (~same & valid_r), r, w)

            # --- Step 4: fill empty slots (j >= 6 iterations are no-ops).
            for j in range(min(R, NSLOTS)):
                pf = jnp.sum(jnp.where(lane == j, rfreq, 0.0))
                pb = jnp.sum(jnp.where(lane == j, rbw, 0.0))
                # Invalid slots have sf == -BIG, which never equals pf >= 0 —
                # no validity guard needed in the containment scan.
                contains = jnp.asarray(False)
                for k in range(NSLOTS):
                    contains = contains | ((sf[k] == pf) & (sb[k] == pb))
                can = unassigned & ~contains

                b1 = can & (sf[j] == -BIG)
                sf[j] = jnp.where(b1, pf, sf[j])
                sb[j] = jnp.where(b1, pb, sb[j])
                can = can & ~b1

                # b2/b3 shift slot j's (always-valid here) content into an
                # empty neighbour, then claim slot j for the probe.
                if j > 0:
                    b2 = can & (sf[j - 1] == -BIG)
                    sf[j - 1] = jnp.where(b2, sf[j], sf[j - 1])
                    sb[j - 1] = jnp.where(b2, sb[j], sb[j - 1])
                    sf[j] = jnp.where(b2, pf, sf[j])
                    sb[j] = jnp.where(b2, pb, sb[j])
                    can = can & ~b2

                if j + 1 < NSLOTS:
                    b3 = can & (sf[j + 1] == -BIG)
                    sf[j + 1] = jnp.where(b3, sf[j], sf[j + 1])
                    sb[j + 1] = jnp.where(b3, sb[j], sb[j + 1])
                    sf[j] = jnp.where(b3, pf, sf[j])
                    sb[j] = jnp.where(b3, pb, sb[j])

            # --- Step 5: stable insertion sort, invalid first then by freq.
            # sf IS the sort key (invalid slots already hold -BIG), so only
            # (sf, sb) swap — validity and the write-back predicate both
            # read off sf afterwards.
            for i in range(1, NSLOTS):
                for j in range(i, 0, -1):
                    swap = sf[j - 1] > sf[j]

                    def sw(arr):
                        a, b = arr[j - 1], arr[j]
                        arr[j - 1] = jnp.where(swap, b, a)
                        arr[j] = jnp.where(swap, a, b)

                    sw(sf)
                    sw(sb)

            # --- Write-back: winners (valid, freq>0) into leading estimates.
            # sf[p] > 0 implies validity (invalid slots hold -BIG).
            count = jnp.int32(0)
            for p in range(NSLOTS):
                is_w = sf[p] > 0.0
                for i in range(L):
                    upd = is_w & (count == i)
                    ef[i] = jnp.where(upd, sf[p], ef[i])
                    eb[i] = jnp.where(upd, sb[p], eb[i])
                count = count + is_w.astype(jnp.int32)

            # Store the output row; the carry stays scalar.
            out_f = jnp.zeros((1, LANES), dtype=dt)
            out_b = jnp.zeros((1, LANES), dtype=dt)
            for i in range(L):
                out_f = jnp.where(lane == i, ef[i], out_f)
                out_b = jnp.where(lane == i, eb[i], out_b)
            of_scr[pl.ds(t, 1), :] = out_f
            ob_scr[pl.ds(t, 1), :] = out_b
            return tuple(ef) + tuple(eb)

        # Frames beyond F (the tail of the last block) still run on the
        # zero-padded rows. That is safe without any masking: the tail lives
        # only in the FINAL block, after which the carry is never read again,
        # and the garbage output rows are sliced off host-side (outf[:F]).
        if file_len == F:
            # Single recording: the only file boundary is frame 0, whose
            # reset to the seed is a no-op (the seed IS the initial carry) —
            # skip the per-frame mod + 2L selects entirely.
            est = jax.lax.fori_loop(0, TBLK, frame_step, est)
        else:

            def guarded(t, est):
                # Reset the carry to the seed at each file boundary.
                g = blk * TBLK + t
                at_start = (g % file_len) == 0
                est = tuple(
                    jnp.where(at_start, e0, e) for e0, e in zip(est0, est)
                )
                return frame_step(t, est)

            est = jax.lax.fori_loop(0, TBLK, guarded, est)

        cp3 = pltpu.make_async_copy(
            of_scr, outf_hbm.at[pl.ds(blk * TBLK, TBLK), :], sems.at[2]
        )
        cp3.start()
        cp4 = pltpu.make_async_copy(
            ob_scr, outb_hbm.at[pl.ds(blk * TBLK, TBLK), :], sems.at[3]
        )
        cp4.start()
        cp3.wait()
        cp4.wait()
        return est

    jax.lax.fori_loop(0, n_blocks, block_loop, est0)


@functools.partial(jax.jit, static_argnames=("interpret", "file_len"))
def mccandless_scan_pallas(
    res_freq: jax.Array,
    res_bw: jax.Array,
    est_freq: jax.Array,
    est_bw: jax.Array,
    interpret: bool = False,
    file_len: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scan the McCandless step over frames. res_* (F, R); est_* (L,).

    Returns (freqs, bws), each (F, L) — the per-frame estimate snapshots
    (FormantExtractor semantics, spectrum.rs:336-369).

    file_len: when F is a fold of several equal-length recordings
    (F = files * file_len), the carry resets to the seed every `file_len`
    frames — one kernel launch tracks a whole batch of files with per-file
    state isolation. Default: F (a single recording).
    """
    F, R = res_freq.shape
    L = est_freq.shape[-1]
    dt = res_freq.dtype
    if R > LANES:
        raise ValueError(f"R={R} exceeds lane capacity {LANES}")
    if file_len is None:
        file_len = F
    if F % file_len:
        raise ValueError(f"F={F} not a multiple of file_len={file_len}")

    Fp = _round_up(F, TBLK)
    rf = jnp.pad(res_freq, [(0, Fp - F), (0, LANES - R)])
    rb = jnp.pad(res_bw, [(0, Fp - F), (0, LANES - R)])
    ef0 = jnp.pad(est_freq[None, :], [(0, 0), (0, LANES - L)])
    eb0 = jnp.pad(est_bw[None, :], [(0, 0), (0, LANES - L)])

    kernel = functools.partial(_kernel, F=F, L=L, R=R, file_len=int(file_len))
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
            jax.ShapeDtypeStruct((Fp, LANES), dt),
            jax.ShapeDtypeStruct((Fp, LANES), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(ef0, eb0, rf, rb)

    return outf[:F, :L], outb[:F, :L]
