"""Pallas kernel: batched Laguerre + deflation polynomial root finder.

The last non-Pallas compute stage of the formant path. The jnp version
(voxtpu/roots.py) is ~220 sequential steps (11 deflation rounds x 20 Laguerre
iterations) of small elementwise ops over (B,) arrays — each XLA loop
iteration round-trips its carries through HBM and pays dispatch overhead.
Here the whole solve runs in one kernel: 1024 frames per grid cell laid out
as (8, 128) tiles, every coefficient row VMEM-resident, the deflation loop a
static Python unroll and Laguerre a fori_loop over register-resident tiles.

Semantics transcribe voxtpu.roots.find_roots (which transcribes
/root/reference/src/polynomial.rs:34-152) INCLUDING the quirks:
- Laguerre's `n` is the initial live degree, held constant through deflation;
- fixed 20 iterations with |p(z)| <= 1e-16 freezing (no early exit);
- +- denominator choice by larger hypot norm;
- leading-zero coefficients shift out as zero roots (the intended
  polynomial.rs:103-106 semantics), per-frame status flags for zero-degree
  and zero-root-division.

One deliberate deviation: Mosaic has no atan2, so the principal complex sqrt
uses the algebraic form (u = sqrt((r+a)/2), v = sign-corrected sqrt((r-a)/2))
instead of the twin's polar form — mathematically identical, ulp-level
differences; the equivalence tests pin the two at tight tolerances
(tests/test_roots.py::test_find_roots_pallas_matches_jnp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtpu import errors

SUB = 8
LANES = 128
CELL = SUB * LANES  # frames per grid cell


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _csqrt(ar, ai):
    """Principal complex sqrt, algebraic form (no atan2 in Mosaic)."""
    r = jnp.hypot(ar, ai)
    u = jnp.sqrt(jnp.maximum((r + ar) * 0.5, 0.0))
    v = jnp.sqrt(jnp.maximum((r - ar) * 0.5, 0.0))
    return u, jnp.where(ai < 0.0, -v, v)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    nrm = br * br + bi * bi
    return (ar * br + ai * bi) / nrm, (ai * br - ar * bi) / nrm


def _laguerre_tile(wr, wi, m0f, valid, dt, iters=20):
    """One batched Laguerre solve over (8, 128) frame tiles.

    wr/wi: N-lists of coefficient tiles. m0f: per-frame float degree (the
    reference's constant `n`). Returns (zr, zi)."""
    N = len(wr)
    eps = jnp.asarray(1.0e-16, dt)
    start = jnp.asarray(-2.0, dt)
    shape = wr[0].shape
    z0r = jnp.full(shape, start, dt)
    z0i = jnp.full(shape, start, dt)
    nm1 = m0f - 1.0

    def body(_, st):
        zr, zi, done = st
        # Horner p, p', p''-accumulator (polynomial.rs:39-45; roots.py twin).
        ar, ai = wr[N - 1], wi[N - 1]
        br = jnp.zeros(shape, dt)
        bi = jnp.zeros(shape, dt)
        gr = jnp.zeros(shape, dt)
        gi = jnp.zeros(shape, dt)
        for j in range(N - 2, -1, -1):
            gr, gi = _cmul(gr, gi, zr, zi)
            gr, gi = gr + br, gi + bi
            br, bi = _cmul(br, bi, zr, zi)
            br, bi = br + ar, bi + ai
            ar, ai = _cmul(ar, ai, zr, zi)
            ar, ai = ar + wr[j], ai + wi[j]
        done = jnp.maximum(done, (jnp.hypot(ar, ai) <= eps).astype(dt))

        car, cai = _cdiv(-br, -bi, ar, ai)  # ca = -p'/p
        ca2r, ca2i = _cmul(car, cai, car, cai)
        tdr, tdi = _cmul(2.0 * gr, 2.0 * gi, jnp.ones(shape, dt), jnp.zeros(shape, dt))
        qr, qi = _cdiv(tdr, tdi, ar, ai)
        cbr, cbi = ca2r - qr, ca2i - qi
        # c1 = sqrt((n-1) * n * cb - ca^2)
        sr_, si_ = _cmul(nm1 * m0f, jnp.zeros(shape, dt), cbr, cbi)
        c1r, c1i = _csqrt(sr_ - ca2r, si_ - ca2i)
        cc1r, cc1i = car + c1r, cai + c1i
        cc2r, cc2i = car - c1r, cai - c1i
        use1 = jnp.hypot(cc1r, cc1i) > jnp.hypot(cc2r, cc2i)
        dr = jnp.where(use1, cc1r, cc2r)
        di = jnp.where(use1, cc1i, cc2i)
        ccr, cci = _cdiv(m0f, jnp.zeros(shape, dt), dr, di)
        upd = (done < 0.5) & valid
        zr = jnp.where(upd, zr + ccr, zr)
        zi = jnp.where(upd, zi + cci, zi)
        return zr, zi, done

    zr, zi, _ = jax.lax.fori_loop(
        0, iters, body, (z0r, z0i, jnp.zeros(shape, dt))
    )
    return zr, zi


def _kernel(cre_ref, cim_ref, rre_ref, rim_ref, cnt_ref, st_ref, *, N: int):
    dt = cre_ref.dtype
    cr = [cre_ref[0, j] for j in range(N)]  # (8, 128) tiles
    ci = [cim_ref[0, j] for j in range(N)]
    shape = cr[0].shape
    zero = jnp.zeros(shape, dt)
    izero = jnp.zeros(shape, jnp.int32)

    # degree / off_low (polynomial.rs:26-32) as tile folds.
    deg = izero
    low = jnp.full(shape, N - 1, jnp.int32)
    for j in range(N - 1, -1, -1):
        nz = (cr[j] != 0.0) | (ci[j] != 0.0)
        deg = jnp.maximum(deg, jnp.where(nz, j, 0))
        low = jnp.where(nz, j, low)  # descending j: last write wins = lowest
    status = jnp.where(deg < 1, errors.POLY_ZERO_DEGREE, 0).astype(jnp.int32)
    m0 = deg - low
    m0f = m0.astype(dt)

    # Low-shift: work[j] = c[j + low] (zero past the end) — per-frame row
    # selection as masked accumulation over the static shift k.
    wr = [zero] * N
    wi = [zero] * N
    for j in range(N):
        accr, acci = zero, zero
        for k in range(N - j):
            sel = low == k
            accr = jnp.where(sel, cr[j + k], accr)
            acci = jnp.where(sel, ci[j + k], acci)
        wr[j], wi[j] = accr, acci

    rr = [zero] * N
    ri = [zero] * N

    for it in range(max(N - 3, 0)):
        active = (it < m0 - 2) & (status == 0)
        zr, zi = _laguerre_tile(wr, wi, m0f, active, dt)
        div_zero = active & (zr == 0.0) & (zi == 0.0)
        status = jnp.where(div_zero, status | errors.POLY_DIV_ZERO, status)
        pos = low + it
        for j in range(N):
            sel = active & (pos == j)
            rr[j] = jnp.where(sel, zr, rr[j])
            ri[j] = jnp.where(sel, zi, ri[j])
        # Synthetic deflation (polynomial.rs:155-195): q[i] = p[i+1] + z*q[i+1].
        carr, cari = zero, zero
        new_r = [zero] * N
        new_i = [zero] * N
        for i in range(N - 2, -1, -1):
            mr, mi = _cmul(zr, zi, carr, cari)
            carr, cari = wr[i + 1] + mr, wi[i + 1] + mi
            new_r[i], new_i[i] = carr, cari
        for i in range(N):
            wr[i] = jnp.where(active, new_r[i], wr[i])
            wi[i] = jnp.where(active, new_i[i], wi[i])

    # Tails (polynomial.rs:131-144).
    zri = low + jnp.maximum(m0 - 2, 0)
    c0r, c0i = wr[0], wi[0]
    c1r, c1i = wr[1], wi[1]
    c2r, c2i = (wr[2], wi[2]) if N >= 3 else (zero, zero)
    a2r, a2i = c2r + c2r, c2i + c2i
    sqr, sqi = _cmul(c1r, c1i, c1r, c1i)
    f4r, f4i = _cmul(jnp.full(shape, 4.0, dt), zero, c2r, c2i)
    pr, pi_ = _cmul(f4r, f4i, c0r, c0i)
    dr_, di_ = _csqrt(sqr - pr, sqi - pi_)
    xqr, xqi = -c1r, -c1i
    rq1r, rq1i = _cdiv(xqr + dr_, xqi + di_, a2r, a2i)
    rq2r, rq2i = _cdiv(xqr - dr_, xqi - di_, a2r, a2i)
    rlr, rli = _cdiv(-c0r, -c0i, c1r, c1i)

    ok = (status & errors.POLY_ZERO_DEGREE) == 0
    is_quad = (m0 >= 2) & ok
    is_lin = (m0 == 1) & ok
    for j in range(N):
        s1 = is_quad & (zri == j)
        s2 = is_quad & (zri + 1 == j)
        sl = is_lin & (zri == j)
        rr[j] = jnp.where(s1, rq1r, jnp.where(s2, rq2r, jnp.where(sl, rlr, rr[j])))
        ri[j] = jnp.where(s1, rq1i, jnp.where(s2, rq2i, jnp.where(sl, rli, ri[j])))

    for j in range(N):
        rre_ref[0, j] = rr[j]
        rim_ref[0, j] = ri[j]
    cnt_ref[0] = deg
    st_ref[0] = status


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_roots_pallas(
    c_re: jax.Array, c_im: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """All roots of (B, N) coefficient pairs: returns (roots_re, roots_im,
    count, status) with roots (B, N). Semantics == voxtpu.roots.find_roots."""
    B, N = c_re.shape
    dt = c_re.dtype
    Bp = _round_up(max(B, 1), CELL)
    if Bp != B:
        # Padding frames are all-zero polynomials: deg 0 -> status flag set,
        # outputs sliced away below.
        c_re = jnp.pad(c_re, ((0, Bp - B), (0, 0)))
        c_im = jnp.pad(c_im, ((0, Bp - B), (0, 0)))
    nb = Bp // CELL

    def to_tiles(a):  # (Bp, N) -> (nb, N, 8, 128)
        return a.reshape(nb, SUB, LANES, N).transpose(0, 3, 1, 2)

    cr4 = to_tiles(c_re)
    ci4 = to_tiles(c_im)

    grid = (nb,)
    rre, rim, cnt, st = pl.pallas_call(
        functools.partial(_kernel, N=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, SUB, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, N, SUB, LANES), dt),
            jax.ShapeDtypeStruct((nb, N, SUB, LANES), dt),
            jax.ShapeDtypeStruct((nb, SUB, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, SUB, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(cr4, ci4)

    def from_tiles(a):  # (nb, N, 8, 128) -> (B, N)
        return a.transpose(0, 2, 3, 1).reshape(Bp, N)[:B]

    roots_re = from_tiles(rre)
    roots_im = from_tiles(rim)
    count = cnt.reshape(Bp)[:B]
    status = st.reshape(Bp)[:B]
    return roots_re, roots_im, count, status
