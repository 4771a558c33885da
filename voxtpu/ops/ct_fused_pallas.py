"""Fused Pallas CT autocorrelation: the whole power+AC chain in one kernel.

The XLA Cooley-Tukey chain (voxtpu/ops/ct_fft.py) is ~6 dot_general passes;
every intermediate — stage-1 DFT, twiddled product, spectrum, power, inverse
stages — round-trips HBM, putting the stage at ~12% of the v5e bandwidth
roofline (PERFORMANCE.md: 10.2 ms moving ~1.0 GB where the irreducible
traffic is ~0.25 GB). This kernel runs the identical decomposition with every
intermediate VMEM-resident: HBM sees one read of the frames and one write
each of the AC lags and the half power spectrum (VERDICT r2 #4).

Math is the four-step factorization documented in ct_fft.py (nfft = N1 x 128,
k = k2*N1 + k1), with three kernel-friendly layout choices:

- The caller supplies frames pre-interleaved as xt[n1, f*128 + n2] (one XLA
  transpose of the input, amortized over the whole chain), so stage 1 is a
  single (N1, rows) x (rows, FB*128) matmul for the whole frame block.
- The inverse's final contraction uses transposed tables (ccT @ U instead of
  U.T @ cc), which lands the lags as acT[l2, l1] — and since the natural lag
  index is l = l1 + 128*l2, writing acT per frame into a (B, L2, 128) output
  makes the XLA-side (B, n) view a FREE reshape: natural order, no gather,
  no transpose.
- The even-k1 half-spectrum rows (the n-point MFCC bins, see ct_fft.py) are
  extracted with a 0/1 selection matmul (exact: one nonzero product per sum)
  instead of a strided sublane slice.

Precision: HIGHEST (6-pass f32) matmuls, matching the XLA CT path's 2e-7.
Equivalence vs the FFT path is pinned by tests/test_autocorr.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ct_fused_supported", "ct_fused_power_ac"]

N2 = 128  # lane width
FB = 8  # frames per grid cell

_PREC = jax.lax.Precision.HIGHEST


VMEM_BUDGET = 12 * 1024 * 1024  # conservative per-core budget (16 MB VMEM
# minus Mosaic double-buffering of the grid-streamed blocks and temporaries)


def ct_fused_vmem_bytes(n: int, nfft: int, itemsize: int = 4) -> int:
    """Static VMEM footprint of one grid cell — the workspace-sizer analog of
    the reference's find_formants_*_work_size (lib.rs:30-36, SURVEY §5).

    Everything is VMEM-resident by design: the input block, the four stage
    tensors, the trig/selection tables (the w1 and inverse-c tables are
    O(n^2/8192) — the quadratic term that eventually overflows), and the two
    output blocks. Live per-f temporaries add ~6 (N1, 128) tiles."""
    N1 = nfft // N2
    rows = n // N2
    L2 = n // N2
    xt = rows * FB * N2
    stages = 4 * N1 * FB * N2  # AR, AI, BR, BI
    tables = (
        2 * N1 * rows  # w1 cos/sin
        + 2 * N1 * FB * N2  # pre-tiled twiddles
        + 2 * N2 * N2  # w2
        + 2 * N2 * N2  # a
        + 2 * N1 * N2  # b
        + 2 * L2 * N1  # c
        + (N1 // 2) * N1  # esel
    )
    outs = FB * L2 * N2 + FB * (N1 // 2) * N2
    temps = 6 * N1 * N2
    return (xt + stages + tables + outs + temps) * itemsize


def ct_fused_supported(n: int, nfft: int) -> bool:
    """The fused kernel covers the production shape family: nfft == 2n,
    n a multiple of 128 (frame length 1024, 2048, ..., 16384), while the
    static VMEM footprint fits the budget (frame 32768's ~20 MB does not —
    callers fall back to the XLA CT chain, voxtpu.autocorr)."""
    return (
        nfft == 2 * n
        and n % N2 == 0
        and n >= N2
        and ct_fused_vmem_bytes(n, nfft) <= VMEM_BUDGET
    )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _tables_np(nfft: int, n: int):
    """Host-built tables, laid out so the kernel never transposes."""
    N1 = nfft // N2
    rows = n // N2
    L2 = n // N2  # lag tiles: all n lags
    n1 = np.arange(rows)
    k1 = np.arange(N1)
    n2 = np.arange(N2)
    k2 = np.arange(N2)
    l1 = np.arange(N2)
    l2 = np.arange(L2)
    w1 = -2.0 * np.pi * np.outer(k1, n1) / N1  # (k1, n1): stage-1 LHS
    tw = -2.0 * np.pi * np.outer(k1, n2) / nfft  # (k1, n2) twiddle
    w2 = -2.0 * np.pi * np.outer(n2, k2) / N2
    a = 2.0 * np.pi * np.outer(k2, l1) / N2
    b = 2.0 * np.pi * np.outer(k1, l1) / nfft
    c = 2.0 * np.pi * np.outer(l2, k1) / N1  # (l2, k1): inverse LHS
    esel = np.zeros((N1 // 2, N1))  # even-k1 row selection
    esel[np.arange(N1 // 2), 2 * np.arange(N1 // 2)] = 1.0
    twc = np.tile(np.cos(tw), (1, FB))  # (k1, FB*128)
    tws = np.tile(np.sin(tw), (1, FB))
    return (
        np.cos(w1), np.sin(w1), twc, tws,
        np.cos(w2), np.sin(w2),
        np.cos(a), np.sin(a), np.cos(b), np.sin(b),
        np.cos(c), np.sin(c), esel,
    )


def _kernel(xt_ref, c1t, s1t, twc, tws, c2, s2, ca, sa, cb, sb, cct, sct,
            esel, ac_ref, pe_ref, *, nfft: int, algorithm: str = "x6"):
    dt = xt_ref.dtype

    def dot(a, b):
        if algorithm == "x3":
            # BF16_BF16_F32_X3 by hand (Mosaic's dot_general takes only a
            # Precision, not a DotAlgorithm): split each f32 operand into
            # bf16 hi + bf16 lo = bf16(x - hi) and take the three largest
            # cross terms — 3 MXU passes instead of HIGHEST's 6, dropping
            # only lo*lo (~2^-32 relative). Error vs f64 measured in
            # scripts/perf_ct_x3.py.
            ah = a.astype(jnp.bfloat16)
            al = (a - ah.astype(dt)).astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            bl = (b - bh.astype(dt)).astype(jnp.bfloat16)

            def d(p, q):
                return jax.lax.dot_general(
                    p, q, (((1,), (0,)), ((), ())), preferred_element_type=dt
                )

            return d(ah, bh) + d(ah, bl) + d(al, bh)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=dt, precision=_PREC,
        )

    xb = xt_ref[:, :]  # (rows, FB*128), column group f holds frame f's n2 axis
    # Stage 1 (contract n1) for the whole block at once.
    AR = dot(c1t[:, :], xb)  # (N1, FB*128)
    AI = dot(s1t[:, :], xb)
    # Stage 2: twiddle (tables pre-tiled across the FB column groups).
    tc = twc[:, :]
    ts = tws[:, :]
    BR = AR * tc - AI * ts
    BI = AR * ts + AI * tc
    inv_n = 1.0 / nfft

    for f in range(FB):
        br = BR[:, f * N2 : (f + 1) * N2]  # (N1, 128)
        bi = BI[:, f * N2 : (f + 1) * N2]
        # Stage 3 (contract n2): the spectrum, permuted [k1, k2].
        xr = dot(br, c2[:, :]) - dot(bi, s2[:, :])
        xi = dot(br, s2[:, :]) + dot(bi, c2[:, :])
        p = xr * xr + xi * xi  # (N1, 128) power
        # Half spectrum: even-k1 rows via exact selection matmul; stored
        # permuted [k1h, k2] (caller reorders — 1 cheap XLA pass).
        pe_ref[f] = dot(esel[:, :], p)
        # Inverse cosine transform, all in VMEM.
        Ca = dot(p, ca[:, :])  # (N1, l1)
        Sa = dot(p, sa[:, :])
        U = Ca * cb[:, :] - Sa * sb[:, :]
        V = Ca * sb[:, :] + Sa * cb[:, :]
        acU = dot(cct[:, :], U)  # (L2, l1) == acT[l2, l1]
        acV = dot(sct[:, :], V)
        # acT[l2, l1] with l = l1 + 128*l2: the (B, n) view is a free reshape.
        ac_ref[f] = (acU - acV) * inv_n


@functools.partial(jax.jit, static_argnames=("nfft", "interpret", "algorithm"))
def ct_fused_power_ac(
    x: jax.Array, nfft: int, interpret: bool = False, algorithm: str = "x6"
) -> tuple[jax.Array, jax.Array]:
    """(B, n) frames -> (half_power (B, n//2+1), ac (B, n)), one fused kernel.

    half_power are the n-point rfft power bins (MFCC's input); ac are the
    first n natural-order lags of irfft(|rfft(x, 2n)|^2) — identical
    semantics to the XLA CT chain / rfft+irfft (quirk correction stays in
    voxtpu.autocorr).

    algorithm: "x6" (default — HIGHEST precision, 6 bf16 MXU passes per f32
    matmul) or "x3" (hand-rolled BF16_BF16_F32_X3, 3 passes — the VERDICT r3
    #1 candidate; accuracy/speed A/B in scripts/perf_ct_x3.py).
    """
    B, n = x.shape
    if not ct_fused_supported(n, nfft):
        raise ValueError(f"unsupported shape n={n} nfft={nfft}")
    dt = x.dtype
    N1 = nfft // N2
    rows = n // N2
    L2 = n // N2

    tabs = tuple(jnp.asarray(t, dt) for t in _tables_np(nfft, n))

    Bp = _round_up(B, FB)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
    # Interleave: xt[n1, f*128 + n2] = x[f, n1*128 + n2] (one XLA transpose).
    xt = x.reshape(Bp, rows, N2).transpose(1, 0, 2).reshape(rows, Bp * N2)

    grid = (Bp // FB,)
    table_specs = [
        pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for t in tabs
    ]
    ac3, pe = pl.pallas_call(
        functools.partial(_kernel, nfft=nfft, algorithm=algorithm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, FB * N2), lambda i: (0, i), memory_space=pltpu.VMEM),
            *table_specs,
        ],
        out_specs=[
            pl.BlockSpec((FB, L2, N2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, N1 // 2, N2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L2, N2), dt),
            jax.ShapeDtypeStruct((Bp, N1 // 2, N2), dt),
        ],
        interpret=interpret,
    )(xt, *tabs)

    ac = ac3.reshape(Bp, L2 * N2)[:B]  # natural order: free reshape
    # Permuted half rows -> natural j = k2*(N1/2) + k1h (one cheap pass).
    half = pe.transpose(0, 2, 1).reshape(Bp, -1)[:B, : n // 2 + 1]
    return half, ac
