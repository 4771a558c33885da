"""Pallas kernel: Brent + windowed-sinc pitch-candidate refinement.

The hottest loop of the framework (SURVEY §3.1 hot loop #2: Brent x sinc-1200
per candidate; the reference spends ~13 ms per frame here). Design:

- Candidates are processed 8 per grid cell (one f32 sublane tile), all 8 from
  the same frame. The grid cell DMAs its frame's autocorrelation prefix into
  VMEM once (consecutive cells of the same frame reuse the resident block) and
  runs the full Brent loop against it — **no gather anywhere**: every tap read
  is an aligned contiguous (1, 128) slice of the frame buffer.
- Tap sums run on (8, 128) tiles: candidate lanes on the sublane axis, lag
  columns on the lane axis. Mosaic requires 128-aligned lane loads, so the
  chunk loop walks aligned tiles over the union of the lanes' tap ranges and
  derives each lane's tap index from the column index (right taps
  n = col - base_r, left taps m = base_l - col); the per-lane +/-1 window
  shift folds into the same arithmetic.
- The per-candidate effective depth is its lag+1 (the reference's low depth
  clip), so the chunk loop's trip count is the *block* range — candidates
  arrive in ascending-lag order per frame, so short-lag blocks do
  proportionally less work (ragged execution via a traced fori bound,
  impossible in plain XLA).
- `sin(pi(phi+n))` is one sin per lane via the (-1)^n identity; the Hann taper
  cos is evaluated per tile on the VPU, fused with the MAC (predicating or
  merging the two tap sides was measured slower — see PERFORMANCE.md).
- 64 candidates per grid cell (8 row blocks) amortize cell-launch overhead;
  the Brent loop is a per-row-block early-exit while_loop.

Numerics match voxtpu.sinc._WindowEval (which matches the reference's
interpolate_sinc, periodic.rs:29-87) — pinned by interpret-mode equivalence
tests in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8  # candidates per row block (f32 sublane count)
SUBBLOCKS = 8  # row blocks per grid cell (amortizes ~1us/cell launch cost)
CELL = BLOCK * SUBBLOCKS  # candidates per grid cell
CHUNK = 256  # lag columns per tile (two lane groups per slice op; measured optimum)

_GOLDEN = 1.0 - 0.6180339887498948482045868343656381177203091798057628621


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x0_ref, k_ref, valid_ref, row_ref, buf_ref, x_out_ref, fx_out_ref,
            strn_out_ref, *,
            offset: int, max_depth: int, T: int, P: int, iters: int, tol: float,
            blocks_per_frame: int, strength_depth: int | None):
    dt = buf_ref.dtype
    eps = float(jnp.finfo(dt).eps)
    sqrt_eps = math.sqrt(eps)

    col_base = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, CHUNK), 1)
    # Column-parity sign tile, hoisted out of every tile pass: chunk starts c0
    # are multiples of CHUNK (even), so (-1)^col == (-1)^col_base — a kernel
    # constant. The per-lane base parity completes the (-1)^(col - base)
    # factorization inside f() (sign algebra on +-1.0 is IEEE-exact, so the
    # factored form is bit-identical to the old per-tile n % 2 computation).
    alt = 1.0 - 2.0 * (col_base % 2).astype(dt)

    for sb in range(SUBBLOCKS):
        _refine_subblock(
            sb, x0_ref, k_ref, valid_ref, row_ref, buf_ref,
            x_out_ref, fx_out_ref, strn_out_ref, col_base, alt,
            dt=dt, eps=eps, sqrt_eps=sqrt_eps,
            offset=offset, max_depth=max_depth, T=T, P=P, iters=iters, tol=tol,
            strength_depth=strength_depth,
        )


def _refine_subblock(sb, x0_ref, k_ref, valid_ref, row_ref, buf_ref,
                     x_out_ref, fx_out_ref, strn_out_ref, col_base, alt, *,
                     dt, eps, sqrt_eps, offset, max_depth, T, P, iters, tol,
                     strength_depth):
    r0 = sb * BLOCK
    x0 = x0_ref[r0 : r0 + BLOCK, :]  # (BLOCK, 1)
    K = k_ref[r0 : r0 + BLOCK, :]  # (BLOCK, 1) int32
    valid = valid_ref[r0 : r0 + BLOCK, :] != 0
    # buf_ref holds 8 frames' buffers; each candidate lane carries its own
    # frame-row index (lanes may come from different frames after the
    # depth-homogenizing sort).
    row = row_ref[r0 : r0 + BLOCK, :]  # (BLOCK, 1) int32
    # Per-lane row selection as a tiny (BLOCK x 8) selection matmul.
    sel = (
        row == jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    ).astype(buf_ref.dtype)

    def f(x, depth=None):
        """Windowed-sinc eval at x (BLOCK, 1) -> (BLOCK, 1)."""
        nl = jnp.floor(x)
        nl_i = nl.astype(jnp.int32)
        phil = x - nl
        phir = 1.0 - phil

        md = jnp.minimum(
            jnp.int32(max_depth if depth is None else depth),
            jnp.maximum(offset + nl_i + 1, 0),
        )
        md = jnp.minimum(md, T)
        md = jnp.where(valid, md, 0)
        mdf = md.astype(dt)

        # Absolute lag-buffer columns: right tap n reads col base_r + n,
        # left tap m reads col base_l - m.
        base_r = offset + nl_i  # (BLOCK, 1)
        base_l = offset + nl_i + 1

        lo = jnp.clip(jnp.min(jnp.where(valid, base_l - md, P)), 0, P - CHUNK)
        hi = jnp.clip(jnp.max(jnp.where(valid, base_r + md, 0)), 0, P - 1)
        c_lo = lo // CHUNK
        nch = jnp.maximum(hi // CHUNK - c_lo + 1, 1)

        sin_l = jnp.sin(jnp.pi * phil)  # (BLOCK, 1)
        sin_r = jnp.sin(jnp.pi * phir)
        taper_rcp_l = 1.0 / (phil + mdf)  # hoisted out of the tile loop
        taper_rcp_r = 1.0 / (phir + mdf)
        # Per-lane base parity: the tap sign (-1)^n factors as
        # (-1)^col * (-1)^base (col parity is the hoisted `alt` tile), so the
        # per-tile integer mod/convert/sign ops reduce to one multiply.
        sign_br = 1.0 - 2.0 * (base_r % 2).astype(dt)  # (BLOCK, 1)
        ss_r = sin_r * sign_br
        ss_l = -sin_l * sign_br  # base_l = base_r + 1 flips the parity

        def chunk_body(ci, acc):
            acc_l, acc_r, at_nl, at_nr = acc
            c0 = pl.multiple_of((c_lo + ci) * CHUNK, CHUNK)
            # Dynamic sublane loads are unsupported; load all 8 frame rows
            # (already VMEM-resident) and pick each lane's row via the
            # selection matmul.
            tile8 = buf_ref[:, pl.ds(c0, CHUNK)]  # (8, CHUNK)
            tile = jnp.dot(sel, tile8, preferred_element_type=dt)  # (BLOCK, CHUNK)
            col = c0 + col_base  # (BLOCK, CHUNK)
            tile_s = tile * alt  # exact sign flips, shared by both sides

            # (Measured r2/r3: predication is a loss in Mosaic at every
            # granularity tried — per-tile-side jnp.any(active) lax.cond, and
            # a per-f()-call cond skipping the at_n* accumulators when no
            # lane is within 1e-10 of an integer (+2.5-3 ms on the fused
            # pass, scripts/perf_refine_trims.py). Everything below runs
            # unconditionally.)
            n_r = col - base_r
            act_r = (n_r >= 0) & (n_r <= md)
            a_r = jnp.pi * (phir + n_r.astype(dt))
            coef_r = (ss_r / a_r) * (0.5 + 0.5 * jnp.cos(a_r * taper_rcp_r))
            acc_r = acc_r + jnp.sum(
                tile_s * jnp.where(act_r, coef_r, 0.0), axis=1, keepdims=True
            )

            n_l = base_l - col
            act_l = (n_l >= 0) & (n_l <= md)
            a_l = jnp.pi * (phil + n_l.astype(dt))
            coef_l = (ss_l / a_l) * (0.5 + 0.5 * jnp.cos(a_l * taper_rcp_l))
            acc_l = acc_l + jnp.sum(
                tile_s * jnp.where(act_l, coef_l, 0.0), axis=1, keepdims=True
            )

            # Values at the integer neighbors (for the 1e-10 snap returns).
            at_nl = at_nl + jnp.sum(jnp.where(n_r == 0, tile, 0.0), axis=1, keepdims=True)
            at_nr = at_nr + jnp.sum(jnp.where(n_r == 1, tile, 0.0), axis=1, keepdims=True)
            return acc_l, acc_r, at_nl, at_nr

        zero = jnp.zeros((BLOCK, 1), dtype=dt)
        acc_l, acc_r, at_nl, at_nr = jax.lax.fori_loop(
            0, nch, chunk_body, (zero, zero, zero, zero)
        )
        result = acc_l + acc_r

        # Integer-snap early returns (periodic.rs:41-42).
        result = jnp.where(jnp.abs(x - (nl + 1.0)) < 1e-10, at_nr, result)
        result = jnp.where(jnp.abs(x - nl) < 1e-10, at_nl, result)
        return result

    if strength_depth is not None:
        # Fused depth-30 strength eval at x0 (periodic.rs:429-435) before the
        # refinement — one kernel pass instead of two launches.
        strn_out_ref[r0 : r0 + BLOCK, :] = f(x0, strength_depth)
    else:
        strn_out_ref[r0 : r0 + BLOCK, :] = x0

    if iters == 0:
        # Evaluation-only mode: interpolation without the Brent loop.
        x_out_ref[r0 : r0 + BLOCK, :] = x0
        fx_out_ref[r0 : r0 + BLOCK, :] = f(x0)
        return

    # ---- Brent (periodic.rs:103-188), all-lane vectorized, early exit.
    a0 = x0 - 1.0
    b0 = x0 + 1.0
    v0 = a0 + _GOLDEN * (b0 - a0)
    fv0 = f(v0)

    def cond(st):
        (it, a, b, x, w, v, fx, fw, fv, done) = st
        return (it < iters) & jnp.any(done < 0.5)

    def body(st):
        (it, a, b, x, w, v, fx, fw, fv, done) = st
        rng = b - a
        middle = (a + b) * 0.5
        tol_act = sqrt_eps * jnp.abs(x) + tol / 3.0
        # `done` carried as a 0/1 float mask (bool vector carries fail to
        # legalize in Mosaic while_loops).
        done = jnp.maximum(
            done,
            (jnp.abs(x - middle) + rng * 0.5 <= 2.0 * tol_act).astype(done.dtype),
        )

        new_step = jnp.where(x < middle, _GOLDEN * (b - x), _GOLDEN * (a - x))
        t_ = (x - w) * (fx - fv)
        q = (x - v) * (fx - fw)
        p = (x - v) * q - (x - w) * t_
        q = 2.0 * q - t_  # sic (periodic.rs:140)
        p = jnp.where(q > 0.0, -p, p)
        q = jnp.where(q > 0.0, q, -q)
        para_ok = (
            (jnp.abs(x - w) >= tol_act)
            & (jnp.abs(p) < jnp.abs(new_step * q))
            & (p > q * (a - x + 2.0 * tol_act))
            & (p < q * (b - x - 2.0 * tol_act))
        )
        new_step = jnp.where(para_ok, p / jnp.where(q == 0.0, 1.0, q), new_step)
        new_step = jnp.where(
            jnp.abs(new_step) < tol_act,
            jnp.where(new_step > 0.0, tol_act, -tol_act),
            new_step,
        )

        t = x + new_step
        ft = f(t)

        better = ft <= fx
        b_b = jnp.where(t < x, x, b)
        a_b = jnp.where(t < x, a, x)
        a_w = jnp.where(t < x, t, a)
        b_w = jnp.where(t < x, b, t)
        keep_w = (ft <= fw) | (jnp.abs(w - x) < eps)
        keep_v = (ft <= fv) | (jnp.abs(v - x) < eps) | (jnp.abs(v - w) < eps)

        na = jnp.where(better, a_b, a_w)
        nb = jnp.where(better, b_b, b_w)
        nv = jnp.where(better, w, jnp.where(keep_w, w, jnp.where(keep_v, t, v)))
        nfv = jnp.where(better, fw, jnp.where(keep_w, fw, jnp.where(keep_v, ft, fv)))
        nw = jnp.where(better, x, jnp.where(keep_w, t, w))
        nfw = jnp.where(better, fx, jnp.where(keep_w, ft, fw))
        nx_ = jnp.where(better, t, x)
        nfx = jnp.where(better, ft, fx)

        upd = done < 0.5
        return (
            it + 1,
            jnp.where(upd, na, a),
            jnp.where(upd, nb, b),
            jnp.where(upd, nx_, x),
            jnp.where(upd, nw, w),
            jnp.where(upd, nv, v),
            jnp.where(upd, nfx, fx),
            jnp.where(upd, nfw, fw),
            jnp.where(upd, nfv, fv),
            done,
        )

    st = (
        jnp.int32(0), a0, b0, v0, v0, v0, fv0, fv0, fv0,
        (~valid).astype(a0.dtype),
    )
    st = jax.lax.while_loop(cond, body, st)
    x_out_ref[r0 : r0 + BLOCK, :] = st[3]
    fx_out_ref[r0 : r0 + BLOCK, :] = st[6]


@functools.partial(
    jax.jit,
    static_argnames=("offset", "max_depth", "T", "max_base", "iters", "tol",
                     "interpret", "strength_depth"),
)
def brent_refine_pallas(
    y: jax.Array,
    x0: jax.Array,
    valid: jax.Array,
    offset: int,
    max_depth: int,
    T: int,
    max_base: int | None = None,
    iters: int = 60,
    tol: float = 1e-10,
    interpret: bool = False,
    strength_depth: int | None = None,
) -> tuple[jax.Array, jax.Array] | tuple[jax.Array, jax.Array, jax.Array]:
    """Refine candidates x0 (B, C) against lag buffers y (B, L).

    T is the static tap bound (see voxtpu.sinc._max_effective_depth). All tap
    reads stay within lag columns [0, 2*maxbase+3] where maxbase bounds
    offset + x0; the frame buffer prefix of that length is what each grid
    cell keeps in VMEM.
    """
    B, C = x0.shape
    L = y.shape[-1]
    dt = y.dtype

    # Pad candidate capacity to a multiple of BLOCK so grid cells never span
    # two frames.
    Cp = _round_up(C, BLOCK)
    if Cp != C:
        pad = [(0, 0), (0, Cp - C)]
        x0 = jnp.pad(x0, pad, constant_values=1.0)
        valid = jnp.pad(valid, pad, constant_values=False)
    R = B * Cp

    # Columns touched: [0, max_base + T + 3] (right taps reach base + md,
    # md <= T; max_base bounds offset + floor(x) over all Brent evals).
    if max_base is None:
        max_base = T + 2
    P = _round_up(max_base + T + 4, CHUNK) + CHUNK
    if L >= P:
        ybuf = y[:, :P]
    else:
        ybuf = jnp.pad(y, [(0, 0), (0, P - L)])

    # Depth homogenization: within each 8-frame group, sort candidate rows by
    # their lag (the per-candidate tap count is ~2*lag). A frame's candidates
    # ladder up to ~sr/fmin, so unsorted blocks always pay the max depth;
    # sorted blocks pay their own. Rows keep a per-lane frame index so the
    # kernel can still pick the right buffer row.
    blocks_per_frame = Cp // BLOCK
    G = 8 * Cp  # rows per 8-frame group
    Bpad8 = _round_up(B, 8)
    if Bpad8 != B:
        padr = [(0, Bpad8 - B), (0, 0)]
        x0 = jnp.pad(x0, padr, constant_values=1.0)
        valid = jnp.pad(valid, padr, constant_values=False)
    # Canonical dead-lane content: every invalid lane carries the same
    # in-range, non-integer probe (== voxtpu.pitch's dead-lane fill,
    # bi + 0.5 = -offset - 0.5) regardless of origin — unused candidate
    # capacity, this function's own Cp/Bpad8 grid padding, or zero-padded
    # batch frames. Mixed valid/invalid boundary blocks then have union tap
    # windows — and therefore the chunked f32 summation order of the VALID
    # lanes — that depend only on the valid candidates, making outputs
    # invariant to batch composition (the CLI's --bucket-frames padding is
    # bit-exact on the TPU path because of this).
    x0 = jnp.where(valid, x0, jnp.asarray(-offset - 0.5, x0.dtype))
    K = jnp.floor(x0).astype(jnp.int32)
    Rp = Bpad8 * Cp
    rowidx = jnp.broadcast_to(
        (jnp.arange(Bpad8) % 8)[:, None].astype(jnp.int32), (Bpad8, Cp)
    )

    sort_key = jnp.where(valid, K, jnp.int32(2**30)).reshape(-1, G)
    perm = jnp.argsort(sort_key, axis=-1, stable=True)

    def permute(a, fill=None):
        return jnp.take_along_axis(a.reshape(-1, G), perm, axis=-1).reshape(Rp)

    x0_f = permute(x0)[:, None]
    k_f = permute(K)[:, None]
    valid_f = permute(valid.astype(jnp.int32))[:, None]
    row_f = permute(rowidx)[:, None]
    inv_perm = jnp.argsort(perm, axis=-1)
    R = Rp
    # Mosaic block shapes need multiples of (8, 128): ship 8 frames' buffers
    # per block and let the cell pick each lane's row (re-fetched only when
    # the block index changes, i.e. once per 8 frames).
    if Bpad8 != B:
        ybuf = jnp.pad(ybuf, [(0, Bpad8 - B), (0, 0)])
    kernel = functools.partial(
        _kernel, offset=offset, max_depth=max_depth, T=T, P=P, iters=iters, tol=tol,
        blocks_per_frame=blocks_per_frame, strength_depth=strength_depth,
    )
    grid = (R // CELL,)
    x_out, fx_out, strn_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (8, P),
                lambda i: ((i * CELL) // (blocks_per_frame * BLOCK * 8), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CELL, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), dt),
            jax.ShapeDtypeStruct((R, 1), dt),
            jax.ShapeDtypeStruct((R, 1), dt),
        ],
        interpret=interpret,
    )(x0_f, k_f, valid_f, row_f, ybuf)

    def unsort(a):
        a = jnp.take_along_axis(a.reshape(-1, G), inv_perm, axis=-1)
        return a.reshape(Bpad8, Cp)[:B, :C]

    x_out = unsort(x_out[:, 0])
    fx_out = unsort(fx_out[:, 0])
    if strength_depth is not None:
        return x_out, fx_out, unsort(strn_out[:, 0])
    return x_out, fx_out
