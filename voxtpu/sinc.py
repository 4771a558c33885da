"""Vectorized windowed-sinc interpolation and Brent maximization.

Reference: `interpolate_sinc` (``/root/reference/src/periodic.rs:29-87``),
`brent_maximize` (periodic.rs:103-188), `improve_extremum`
(periodic.rs:192-230) — the hot inner loops of Boersma pitch strength and
refinement.

TPU design: the per-tap serial sum becomes one masked reduction over a static
tap axis, batched over (frame, candidate) lanes; Brent's 60-iteration branchy
loop becomes an early-exit `lax.while_loop` whose lanes all run the same
schedule with masked (frozen-when-converged) state, so the whole refinement
stage is one dense vector program with no data-dependent control flow. (The
jnp path here is the CPU/parity twin; the TPU fast path is the Pallas kernel
in voxtpu/ops/refine_pallas.py, selected by `backend`.)

Reference-exact quirks kept:
- the depth-clipping rules, including the asymmetric `nx - offset + nl - 1`
  upper clip (periodic.rs:46-57);
- the Hann taper denominators `phil + max_depth` / `phir + max_depth` using
  the *clipped* depth (periodic.rs:70, 81);
- index clamping (left taps clamp at 0; right taps clamp at both ends,
  periodic.rs:64-66, 76-78);
- the 1e-10 integer-snap early returns (periodic.rs:41-42);
- Brent's `q = 2q - t` parabolic denominator (periodic.rs:140 — textbook
  Brent uses 2(q - t));
- `sin(pi(phi+n))` is evaluated as `sin(pi*phi) * (-1)^n` — analytically
  identical and *more* accurate than the reference's direct `a.sin()`, and one
  transcendental per lane instead of one per tap.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["interpolate_sinc", "brent_maximize_sinc", "improve_extremum_sinc",
           "improve_extremum"]


def _max_effective_depth(offset: int, nx: int, max_depth: int, max_x: float) -> int:
    """Static bound on the clipped depth for trace-time tap sizing.

    The low clip (periodic.rs:46-52) lowers depth to offset+nr, so the
    effective depth is min(max_depth, offset + floor(x) + 2) <= min(max_depth,
    offset + floor(max_x) + 2). The high clip (periodic.rs:55-57) *raises*
    depth to nx - offset + nl - 1, but it is reachable only for degenerate
    parabolic candidates in tiny-frame configurations (it needs
    offset + nl + depth >= nx after the low clip); the batched kernel clamps
    such lanes to this static bound instead of tripling the tap count — the
    reference's behavior there is an artifact of summing thousands of
    index-clamped taps of the zero pad.
    """
    on_max = offset + int(math.floor(max_x)) + 1
    return min(max_depth, max(on_max + 1, 0))


def interpolate_sinc(
    y: jax.Array,
    offset: int,
    nx: int,
    x: jax.Array,
    max_depth: int,
    max_x: float | None = None,
) -> jax.Array:
    """Windowed-sinc interpolation of y at real positions x, batched.

    Args:
      y: (B, L) sampled function (the doubled autocorrelation buffer).
      offset/nx/max_depth: static ints, as in the reference signature.
      x: (B, C) evaluation points (candidate lanes per frame).
      max_x: static upper bound on x values, for tap sizing (default nx).

    Returns (B, C) interpolated values.
    """
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    dt = y.dtype
    L = y.shape[-1]
    if max_x is None:
        max_x = float(nx)
    taps = _max_effective_depth(offset, nx, max_depth, max_x) + 1

    nl = jnp.floor(x)
    nr = nl + 1.0
    phil = x - nl
    phir = 1.0 - phil
    nl_i = nl.astype(jnp.int32)

    # Traced clipped depth: the reference's low clip, bounded by the static
    # tap count (see _max_effective_depth on the high clip).
    md = jnp.minimum(
        jnp.asarray(max_depth, dtype=jnp.int32),
        jnp.maximum(offset + nl_i + 1, 0),
    )
    md = jnp.minimum(md, taps - 1)
    md_f = md.astype(dt)

    tap = jnp.arange(taps, dtype=dt)  # (T,)
    tap_i = jnp.arange(taps, dtype=jnp.int32)
    sign = jnp.asarray(1.0 - 2.0 * (jnp.arange(taps) % 2), dtype=dt)  # (-1)^n
    active = tap_i[None, None, :] <= md[..., None]  # (B, C, T)

    def gather(idx):
        # idx: (B, C, T) int32 clamped into [0, L)
        return jnp.take_along_axis(
            y[:, None, :], jnp.clip(idx, 0, L - 1).reshape(idx.shape[0], -1)[:, None, :], axis=-1
        ).reshape(idx.shape)

    sin_l = jnp.sin(jnp.pi * phil)[..., None] * sign  # sin(pi(phil+n))
    a_l = jnp.pi * (phil[..., None] + tap)
    idx_l = offset + nr.astype(jnp.int32)[..., None] - tap_i
    idx_l = jnp.maximum(idx_l, 0)
    taper_l = 0.5 + 0.5 * jnp.cos(a_l / (phil[..., None] + md_f[..., None]))
    term_l = gather(idx_l) * (sin_l / a_l) * taper_l

    sin_r = jnp.sin(jnp.pi * phir)[..., None] * sign
    a_r = jnp.pi * (phir[..., None] + tap)
    idx_r = offset + nl_i[..., None] + tap_i
    idx_r = jnp.clip(idx_r, 0, L - 1)
    taper_r = 0.5 + 0.5 * jnp.cos(a_r / (phir[..., None] + md_f[..., None]))
    term_r = gather(idx_r) * (sin_r / a_r) * taper_r

    result = jnp.sum(jnp.where(active, term_l + term_r, 0.0), axis=-1)

    # Early-return cases (periodic.rs:38-42).
    y_last_window = y[:, min(max(offset + nx - 1, 0), L - 1)][:, None]
    y_first = y[:, 0][:, None]
    near_nl = jnp.abs(x - nl) < 1.0e-10
    near_nr = jnp.abs(x - nr) < 1.0e-10
    y_at_nl = jnp.take_along_axis(y, jnp.clip(offset + nl_i, 0, L - 1), axis=-1)
    y_at_nr = jnp.take_along_axis(y, jnp.clip(offset + nl_i + 1, 0, L - 1), axis=-1)

    result = jnp.where(near_nr, y_at_nr, result)
    result = jnp.where(near_nl, y_at_nl, result)
    result = jnp.where(x < 0.0, y_first, result)
    result = jnp.where(x > nx, y_last_window, result)
    return result


_GOLDEN = 1.0 - 0.6180339887498948482045868343656381177203091798057628621
_EPS = float(jnp.finfo(jnp.float64).eps)


class _WindowEval:
    """Gather-free sinc evaluation for Brent refinement.

    During Brent the evaluation point moves within (x0-1, x0+1), so
    floor(x) - floor(x0) is always in {-1, 0, +1} and every tap read falls in
    one contiguous window of y around floor(x0). We materialize that window
    once per (frame, candidate) lane — the only gather — and every Brent
    iteration becomes static window slices x tap coefficients, a dense
    VPU-friendly multiply-reduce. (The naive form re-gathers ~(B*C*T) scattered
    elements per iteration, a TPU anti-pattern: gathers serialize on the
    scalar unit while this runs on the full vector datapath.)
    """

    def __init__(self, y: jax.Array, offset: int, nx: int, x0: jax.Array, max_depth: int, taps: int):
        self.offset = offset
        self.nx = nx
        self.max_depth = max_depth
        self.T = taps - 1
        dt = y.dtype
        self.dt = dt
        L = y.shape[-1]
        K = jnp.floor(x0).astype(jnp.int32)  # (B, C)
        self.K = K
        W = 2 * self.T + 4
        wstart = offset + K - self.T  # (B, C)
        rel = jnp.arange(W, dtype=jnp.int32)
        idx = jnp.clip(wstart[..., None] + rel, 0, L - 1)  # (B, C, W)
        self.win = jnp.take_along_axis(
            y[:, None, :], idx.reshape(idx.shape[0], -1)[:, None, :], axis=-1
        ).reshape(idx.shape)
        self.tap = jnp.arange(taps, dtype=dt)
        self.tap_i = jnp.arange(taps, dtype=jnp.int32)
        self.sign = jnp.asarray(1.0 - 2.0 * (jnp.arange(taps) % 2), dtype=dt)

    def __call__(self, x: jax.Array) -> jax.Array:
        T = self.T
        dt = self.dt
        nl = jnp.floor(x)
        nl_i = nl.astype(jnp.int32)
        s = jnp.clip(nl_i - self.K, -1, 1)  # shift in {-1, 0, 1}
        phil = x - nl
        phir = 1.0 - phil

        md = jnp.minimum(
            jnp.asarray(self.max_depth, dtype=jnp.int32),
            jnp.maximum(self.offset + nl_i + 1, 0),
        )
        md = jnp.minimum(md, T)
        md_f = md.astype(dt)
        active = self.tap_i[None, None, :] <= md[..., None]

        a_l = jnp.pi * (phil[..., None] + self.tap)
        coef_l = (jnp.sin(jnp.pi * phil)[..., None] * self.sign / a_l) * (
            0.5 + 0.5 * jnp.cos(a_l / (phil[..., None] + md_f[..., None]))
        )
        a_r = jnp.pi * (phir[..., None] + self.tap)
        coef_r = (jnp.sin(jnp.pi * phir)[..., None] * self.sign / a_r) * (
            0.5 + 0.5 * jnp.cos(a_r / (phir[..., None] + md_f[..., None]))
        )
        coef_l = jnp.where(active, coef_l, 0.0)
        coef_r = jnp.where(active, coef_r, 0.0)

        # Left taps read window cells r = s + T + 1 - n, i.e. a reversed slice;
        # right taps read r = s + T + n. Three static slices per side, selected
        # by the lane's shift.
        winf = jnp.flip(self.win, axis=-1)
        W = self.win.shape[-1]
        result = jnp.zeros_like(x)
        lsum = jnp.zeros_like(x)
        rsum = jnp.zeros_like(x)
        for sv in (-1, 0, 1):
            # left: window index descends from sv+T+1; in flipped coords the
            # slice starts at W-1-(sv+T+1) = T+2-sv and ascends with n.
            lstart = T + 2 - sv
            lslice = winf[..., lstart : lstart + T + 1]
            rstart = sv + T
            rslice = self.win[..., rstart : rstart + T + 1]
            l_ = jnp.sum(lslice * coef_l, axis=-1)
            r_ = jnp.sum(rslice * coef_r, axis=-1)
            pick = s == sv
            lsum = jnp.where(pick, l_, lsum)
            rsum = jnp.where(pick, r_, rsum)
        result = lsum + rsum

        # Integer-snap early returns (periodic.rs:41-42): y[offset+nl] is the
        # right-side n=0 cell, y[offset+nr] the next one.
        at_nl = jnp.zeros_like(x)
        at_nr = jnp.zeros_like(x)
        for sv in (-1, 0, 1):
            pick = s == sv
            at_nl = jnp.where(pick, self.win[..., sv + T], at_nl)
            at_nr = jnp.where(pick, self.win[..., sv + T + 1], at_nr)
        result = jnp.where(jnp.abs(x - (nl + 1.0)) < 1e-10, at_nr, result)
        result = jnp.where(jnp.abs(x - nl) < 1e-10, at_nl, result)
        return result


def brent_maximize_sinc(
    y: jax.Array,
    offset: int,
    nx: int,
    ixmid: jax.Array,
    max_depth: int,
    tol: float = 1e-10,
    max_x: float | None = None,
    iters: int = 60,
    lane_mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Brent maximization of the sinc interpolant on (ixmid-1, ixmid+1).

    Transcribes brent_maximize (periodic.rs:103-188) as an early-exit loop over
    batched lanes. Returns (x, fx).
    """
    y = jnp.asarray(y)
    ixmid = jnp.asarray(ixmid)
    dt = y.dtype
    eps = float(jnp.finfo(dt).eps)
    sqrt_eps = math.sqrt(eps)

    taps = _max_effective_depth(offset, nx, max_depth, max_x if max_x is not None else float(nx)) + 1
    f = _WindowEval(y, offset, nx, ixmid, max_depth, taps)

    a0 = ixmid - 1.0
    b0 = ixmid + 1.0
    v0 = a0 + _GOLDEN * (b0 - a0)
    fv0 = f(v0)

    # Dead (padding) candidate lanes start converged: the early-exit
    # while_loop then runs only as long as the slowest *live* lane.
    done0 = jnp.zeros_like(ixmid, dtype=bool) if lane_mask is None else ~lane_mask
    state = dict(
        a=a0, b=b0, x=v0, w=v0, v=v0, fx=fv0, fw=fv0, fv=fv0,
        done=done0,
    )

    def body(s):
        a, b, x, w, v = s["a"], s["b"], s["x"], s["w"], s["v"]
        fx, fw, fv, done = s["fx"], s["fw"], s["fv"], s["done"]
        it = s["it"]

        rng = b - a
        middle = (a + b) * 0.5
        tol_act = sqrt_eps * jnp.abs(x) + tol / 3.0
        done = done | (jnp.abs(x - middle) + rng * 0.5 <= 2.0 * tol_act)

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
        # better branch
        b_b = jnp.where(t < x, x, b)
        a_b = jnp.where(t < x, a, x)
        # worse branch
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

        upd = ~done
        out = dict(
            a=jnp.where(upd, na, a),
            b=jnp.where(upd, nb, b),
            x=jnp.where(upd, nx_, x),
            w=jnp.where(upd, nw, w),
            v=jnp.where(upd, nv, v),
            fx=jnp.where(upd, nfx, fx),
            fw=jnp.where(upd, nfw, fw),
            fv=jnp.where(upd, nfv, fv),
            done=done,
            it=it + 1,
        )
        return out

    state["it"] = jnp.asarray(0, dtype=jnp.int32)

    def cond(s):
        return (s["it"] < iters) & jnp.any(~s["done"])

    state = jax.lax.while_loop(cond, body, state)
    return state["x"], state["fx"]


def improve_extremum_sinc(
    y: jax.Array,
    offset: int,
    nx: int,
    ixmid: jax.Array,
    max_depth: int,
    max_x: float | None = None,
    lane_mask: jax.Array | None = None,
    backend: str = "jnp",
    is_max: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """improve_extremum, Sinc branch (periodic.rs:208-228).

    Edge cases ixmid == 0 / ixmid >= nx (periodic.rs:193-194) are handled with
    selects. Returns (xmid, ymid) batched.

    is_max=False transcribes the reference's closure (periodic.rs:216-221):
    Brent runs on the *negated* interpolant — the interpolant is linear in y,
    so negating y is identical — and the returned ymid is that negated value;
    the edge-case returns use raw y either way (periodic.rs:193-194 fire
    before the closure exists).

    backend: "jnp" (dense XLA), "pallas" (TPU kernel), or "pallas_interpret"
    (kernel under the interpreter, for CPU equivalence tests).
    """
    y = jnp.asarray(y)
    yb = y if is_max else -y
    if backend in ("pallas", "pallas_interpret"):
        from voxtpu.ops.refine_pallas import brent_refine_pallas

        taps = _max_effective_depth(
            offset, nx, max_depth, max_x if max_x is not None else float(nx)
        ) + 1
        mask = (
            lane_mask
            if lane_mask is not None
            else jnp.ones_like(jnp.asarray(ixmid), dtype=bool)
        )
        mx = max_x if max_x is not None else float(nx)
        xb, fb = brent_refine_pallas(
            yb,
            jnp.asarray(ixmid),
            mask,
            offset,
            max_depth,
            taps - 1,
            max_base=offset + int(math.floor(mx)) + 3,
            interpret=backend == "pallas_interpret",
        )
    else:
        xb, fb = brent_maximize_sinc(yb, offset, nx, ixmid, max_depth, max_x=max_x,
                                     lane_mask=lane_mask)
    L = y.shape[-1]
    y0 = y[:, 0][:, None]
    y_last = y[:, min(nx - 1, L - 1)][:, None]
    at_zero = ixmid == 0.0
    past_end = ixmid >= nx
    xmid = jnp.where(at_zero, 0.0, jnp.where(past_end, float(nx), xb))
    ymid = jnp.where(at_zero, y0, jnp.where(past_end, y_last, fb))
    return xmid, ymid


def improve_extremum(
    y: jax.Array,
    offset: int,
    nx: int,
    ixmid: jax.Array,
    interpolation: str = "sinc",
    max_depth: int = 1200,
    is_max: bool = True,
    max_x: float | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The reference's full `improve_extremum` (periodic.rs:192-230), batched.

    interpolation: "none" (returns (0, y[0]), periodic.rs:197-199),
    "parabolic" (3-point parabola with the reference's quirky second
    difference `2*mid - (y[i+1] - y[i-1])`, periodic.rs:200-206), or "sinc"
    (Brent over the windowed-sinc interpolant, periodic.rs:208-228;
    is_max=False negates the interpolant inside Brent, periodic.rs:216-221 —
    a mode the reference itself never invokes, periodic.rs:444).
    """
    y = jnp.asarray(y)
    ixmid = jnp.asarray(ixmid)
    if interpolation == "sinc":
        return improve_extremum_sinc(
            y, offset, nx, ixmid, max_depth, max_x=max_x, is_max=is_max
        )

    y0 = y[:, 0][:, None]
    if interpolation == "none":
        zero = jnp.zeros_like(ixmid)
        return zero, jnp.broadcast_to(y0, ixmid.shape)
    if interpolation != "parabolic":
        raise ValueError(f"unknown interpolation: {interpolation}")

    # Parabolic branch (periodic.rs:200-206): reads y at floor(ixmid)-1..+1.
    i0 = jnp.floor(ixmid).astype(jnp.int32)
    L = y.shape[-1]
    ym = jnp.take_along_axis(y, jnp.clip(i0 - 1, 0, L - 1), axis=-1)
    yc = jnp.take_along_axis(y, jnp.clip(i0, 0, L - 1), axis=-1)
    yp = jnp.take_along_axis(y, jnp.clip(i0 + 1, 0, L - 1), axis=-1)
    diff = yp - ym
    dy = 0.5 * diff
    d2y = 2.0 * yc - diff  # sic: periodic.rs:204 (textbook is 2*mid - ym - yp)
    xmid = ixmid + dy / d2y
    ymid = yc + 0.5 * dy * dy / d2y

    # Edge cases (periodic.rs:193-194).
    y_last = y[:, min(nx - 1, L - 1)][:, None]
    at_zero = ixmid == 0.0
    past_end = ixmid >= nx
    xmid = jnp.where(at_zero, 0.0, jnp.where(past_end, float(nx), xmid))
    ymid = jnp.where(at_zero, y0, jnp.where(past_end, y_last, ymid))
    return xmid, ymid
