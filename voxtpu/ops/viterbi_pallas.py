"""Pallas kernel: the Viterbi pitch-path DP (forward pass + backtrace).

The opt-in path search (voxtpu.viterbi, the pass the reference stubbed out —
periodic.rs:320-354) is a sequential DP over frames. As a `lax.scan`, each
tiny (C, C) step is a handful of individually-dispatched HLO ops; even with
`unroll=8` the stage measured ~36-40 ms wall (~8-12 ms device) at 5121
frames — scan-step-overhead-bound (scripts/perf_viterbi.py). This kernel
runs the whole DP (and the reverse backtrace) inside one `pallas_call`,
following the McCandless-scan pattern (voxtpu/ops/formant_scan_pallas.py):

- Frame rows (local score, transition frequency, voiced mask) stream
  HBM->VMEM in TBLK-frame blocks, one DMA per block; backpointer rows stream
  back out the same way, then stream back IN during the reverse pass.
- The DP carry is three (Cs, 1) columns (previous frame's path scores,
  transition freqs, voiced mask). Each step builds the (Cs, LANES) transition
  tile against the current frame's rows, reduces over the sublane (previous
  candidate) axis, and transposes the new row back into columns with a
  where-identity lane-reduce (selection by `where`, never by multiply — the
  score rows carry -inf pads and -inf * 0 is NaN).
- The octave-jump cost computes `log2(f_prev / f_cur)` exactly as the jnp
  twin does (ratio first, then log2) so paths are bit-identical; argmax uses
  first-win min-reduce semantics to match `jnp.argmax` tie-breaking.
- The backtrace packs each block's path indices into one (1, TBLK) row
  (frame-within-block on the lane axis), so the path output is dense.

Semantics are pinned to voxtpu.viterbi.pitch_path (backend="jnp") by
interpret-mode equality tests (tests/test_pallas.py), which in turn is
pinned frame-for-frame to an independent Boersma (1993) oracle
(tests/test_viterbi.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TBLK = 128  # frames per DMA block == path indices packed per output row


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(loc_hbm, fq_hbm, v_hbm, bp_hbm, path_hbm,
            loc_scr, fq_scr, v_scr, bp_scr, path_scr, sems, *,
            F: int, C: int, Cs: int, ojc: float, vuc: float):
    dt = loc_scr.dtype
    neg_inf = jnp.asarray(-jnp.inf, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (Cs, LANES), 1)
    sub_t = jax.lax.broadcasted_iota(jnp.int32, (Cs, LANES), 0)
    ident = lane_t == sub_t  # col[i] = row[0, i] selection tile
    n_blocks = (F + TBLK - 1) // TBLK

    def colT(row, fill):
        """Transpose a (1, LANES) row into a (Cs, 1) column (first Cs lanes).

        Selection by `where` + lane reduce: rows may hold -inf, and
        -inf * 0 == NaN would poison a multiply-based transpose.
        """
        b = jnp.broadcast_to(row, (Cs, LANES))
        return jnp.sum(jnp.where(ident, b, fill), axis=1, keepdims=True)

    # ---- Forward DP.
    def block_fwd(blk, carry):
        score_col, f_col, v_col, last_c = carry

        for r, (hbm, scr) in enumerate(
            ((loc_hbm, loc_scr), (fq_hbm, fq_scr), (v_hbm, v_scr))
        ):
            cp = pltpu.make_async_copy(
                hbm.at[pl.ds(blk * TBLK, TBLK), :], scr, sems.at[r]
            )
            cp.start()
            cp.wait()

        def frame_step(t, carry):
            score_col, f_col, v_col, last_c = carry
            g = blk * TBLK + t
            loc_row = loc_scr[pl.ds(t, 1), :]  # (1, LANES)
            fq_row = fq_scr[pl.ds(t, 1), :]
            v_row = v_scr[pl.ds(t, 1), :]

            # Transition cost (viterbi.py trans()): both voiced pay the
            # octave-jump cost, exactly one pays the voiced/unvoiced cost.
            vp = v_col > 0.5  # (Cs, 1)
            vc = v_row > 0.5  # (1, LANES)
            both = vp & vc
            onev = vp ^ vc
            jump = jnp.abs(jnp.log2(f_col / fq_row))  # (Cs, LANES)
            cost = jnp.where(
                both, ojc * jump, jnp.where(onev, vuc, 0.0)
            )
            total = score_col - cost
            mx = jnp.max(total, axis=0, keepdims=True)  # (1, LANES)
            # First-win argmax over the previous-candidate axis (jnp.argmax
            # tie semantics); all-(-inf) columns resolve to 0 like argmax.
            bp = jnp.min(
                jnp.where(total == mx, sub_t, Cs), axis=0, keepdims=True
            )
            bp = jnp.where(bp == Cs, 0, bp).astype(jnp.int32)

            is0 = g == 0
            new_row = jnp.where(is0, loc_row, loc_row + mx)
            bp_scr[pl.ds(t, 1), :] = jnp.where(is0, 0, bp)

            keep = g < F
            new_score = jnp.where(keep, colT(new_row, 0.0), score_col)
            new_f = jnp.where(keep, colT(fq_row, 0.0), f_col)
            new_v = jnp.where(keep, colT(v_row, 0.0), v_col)

            # Path start: first-win argmax over the final frame's scores.
            mxv = jnp.max(new_row)
            cand = jnp.min(jnp.where(new_row == mxv, lane, LANES))
            last_c = jnp.where(g == F - 1, jnp.minimum(cand, LANES - 1), last_c)
            return new_score, new_f, new_v, last_c

        carry = jax.lax.fori_loop(
            0, TBLK, frame_step, (score_col, f_col, v_col, last_c)
        )

        cp = pltpu.make_async_copy(
            bp_scr, bp_hbm.at[pl.ds(blk * TBLK, TBLK), :], sems.at[3]
        )
        cp.start()
        cp.wait()
        return carry

    zero_col = jnp.zeros((Cs, 1), dtype=dt)
    carry0 = (zero_col + neg_inf, zero_col + 1.0, zero_col, jnp.int32(0))
    _, _, _, last_c = jax.lax.fori_loop(0, n_blocks, block_fwd, carry0)

    # ---- Backtrace (reverse over blocks, reverse within block).
    def block_bwd(rb, c):
        blk = n_blocks - 1 - rb
        cp = pltpu.make_async_copy(
            bp_hbm.at[pl.ds(blk * TBLK, TBLK), :], bp_scr, sems.at[4]
        )
        cp.start()
        cp.wait()

        def frame_step(rt, carry):
            c, pack = carry
            t = TBLK - 1 - rt
            g = blk * TBLK + t
            within = g < F
            pack = jnp.where(within & (lane == t), c, pack)
            bp_row = bp_scr[pl.ds(t, 1), :]
            prev = jnp.sum(jnp.where(lane == c, bp_row, 0), dtype=jnp.int32)
            c = jnp.where(within & (g > 0), prev, c)
            return c, pack

        c, pack = jax.lax.fori_loop(
            0, TBLK, frame_step, (c, jnp.zeros((1, TBLK), jnp.int32))
        )
        path_scr[:] = pack
        cp = pltpu.make_async_copy(
            path_scr, path_hbm.at[pl.ds(blk, 1), :], sems.at[5]
        )
        cp.start()
        cp.wait()
        return c

    jax.lax.fori_loop(0, n_blocks, block_bwd, last_c)


@functools.partial(
    jax.jit, static_argnames=("ojc", "vuc", "interpret")
)
def viterbi_path_pallas(
    local: jax.Array,
    freq: jax.Array,
    voiced: jax.Array,
    ojc: float,
    vuc: float,
    interpret: bool = False,
) -> jax.Array:
    """Maximum-score path through per-frame candidates.

    Args:
      local: (F, C) per-candidate local scores, -inf for invalid lanes
        (viterbi.py's `local`, already silence/octave-cost adjusted).
      freq: (F, C) transition frequencies — `where(voiced, f0, 1.0)`.
      voiced: (F, C) bool voiced mask.
      ojc / vuc: octave-jump and voiced/unvoiced transition costs.

    Returns:
      (F,) int32 path (candidate index per frame), identical to the
      backtraced `lax.scan` DP in voxtpu.viterbi.pitch_path.
    """
    F, C = local.shape
    dt = local.dtype
    if C > LANES:
        raise ValueError(f"C={C} exceeds lane capacity {LANES}")
    Cs = max(_round_up(C, 8), 8)
    Fp = _round_up(F, TBLK)
    n_blocks = Fp // TBLK

    loc = jnp.pad(local, [(0, Fp - F), (0, LANES - C)],
                  constant_values=-jnp.inf)
    fq = jnp.pad(freq.astype(dt), [(0, Fp - F), (0, LANES - C)],
                 constant_values=1.0)
    v = jnp.pad(voiced.astype(dt), [(0, Fp - F), (0, LANES - C)])

    kernel = functools.partial(
        _kernel, F=F, C=C, Cs=Cs, ojc=float(ojc), vuc=float(vuc)
    )
    _, path = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Fp, LANES), jnp.int32),  # backpointers
            jax.ShapeDtypeStruct((n_blocks, TBLK), jnp.int32),  # packed path
        ],
        scratch_shapes=[
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), dt),
            pltpu.VMEM((TBLK, LANES), jnp.int32),
            pltpu.VMEM((1, TBLK), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )(loc, fq, v)

    return path.reshape(-1)[:F]
