"""Fused pitch pre-stage: normalize + lag-window + pad + local maxima +
parabolic frequency + band filter, one Pallas kernel (VERDICT r3 #9).

The XLA version of this block (voxtpu/pitch.py, transcribing
periodic.rs:400-439) is several elementwise/shifted passes over the (B, n)
lag buffer — measured ~1.4 ms of the 5121-frame pitch stage
(scripts/perf_pitch_stages.py s2 - s1 tail). Here every pass reads the
VMEM-resident normalized buffer once:

- normalization by max |r| and the HanningLag division keep the exact XLA
  op order (two divisions), so outputs are bit-identical to the jnp path;
- degenerate (all-zero) frames produce 0/0 = NaN rows — zeroed exactly as
  pitch.py does (the NaN-poisoning rationale lives there);
- the l±1 neighbor access for the 3-window strict maxima
  (periodic.rs:413-417) is lane-misaligned, which Mosaic loads cannot do:
  each 128-lane tile takes its neighbors via exact 0/1 shift matmuls plus a
  one-lane boundary matmul from the adjacent tile (the selection-matmul
  idiom from ops/refine_pallas.py);
- the parabolic vertex frequency (periodic.rs:420-425) and the band filter
  (periodic.rs:439) are fused in the same tile loop.

Outputs: the padded self_lag buffer (B, 2n) the refine kernel consumes, and
lag-indexed freq / cand arrays (B, bi) for the compaction stage (freq is
zeroed on non-candidate lanes; every consumer masks on cand).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pitch_pre_supported", "pitch_pre_pallas"]

FB = 8  # frames per grid cell
T = 128  # lane tile


def pitch_pre_supported(n: int, bi: int) -> bool:
    """Tile walk needs bi a multiple of 128 with a full neighbor tile above
    (bi + 128 <= n, true for bi = n//2); frame lens 512, 1024, ..., 16384."""
    return bi % T == 0 and bi >= T and bi + T <= n and n % T == 0


@functools.lru_cache(maxsize=4)
def _shift_tables():
    shl = np.zeros((T, T), np.float32)  # out[j] = in[j+1]
    shl[np.arange(1, T), np.arange(T - 1)] = 1.0
    shr = np.zeros((T, T), np.float32)  # out[j] = in[j-1]
    shr[np.arange(T - 1), np.arange(1, T)] = 1.0
    e_to127 = np.zeros((T, T), np.float32)  # next tile's lane 0 -> lane 127
    e_to127[0, T - 1] = 1.0
    e_from127 = np.zeros((T, T), np.float32)  # prev tile's lane 127 -> lane 0
    e_from127[T - 1, 0] = 1.0
    return shl, shr, e_to127, e_from127


def _kernel(ac_ref, hl_ref, shl, shr, e_to, e_from, sl_ref, freq_ref, cand_ref,
            *, n: int, bi: int, sr: float, fmin: float, fmax: float):
    dt = ac_ref.dtype

    a = ac_ref[:, :]  # (FB, n)
    m = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    # Two divisions, exactly the XLA op order (pitch.py): / max, / lag window.
    s = (a / m) / hl_ref[:, :]
    s = jnp.where(jnp.isfinite(s), s, jnp.zeros_like(s))
    sl_ref[:, :n] = s
    sl_ref[:, n:] = jnp.zeros((FB, n), dt)

    def dot(x, mtx):
        return jax.lax.dot_general(
            x, mtx[:, :], (((1,), (0,)), ((), ())), preferred_element_type=dt
        )

    lane = jax.lax.broadcasted_iota(jnp.int32, (FB, T), 1)
    for t in range(0, bi, T):
        V = s[:, t : t + T]
        Vn = s[:, t + T : t + 2 * T]  # always exists: t + 2T <= bi + T <= n
        right = dot(V, shl) + dot(Vn, e_to)  # right[l] = s[t + l + 1]
        left = dot(V, shr)
        if t > 0:
            left = left + dot(s[:, t - T : t], e_from)  # left[0] = s[t - 1]
        is_max = (left < V) & (right < V)
        lag = lane + t
        lag_f = lag.astype(dt)
        dr = 0.5 * (right - left)
        d2r = 2.0 * V - (left - right)
        freq = sr / (lag_f + dr / d2r)
        cand = (
            is_max
            & ((freq == 0.0) | ((freq > fmin) & (freq < fmax)))
            & (lag >= 1)
            & (lag <= bi - 2)
        )
        freq_ref[:, t : t + T] = jnp.where(cand, freq, jnp.zeros_like(freq))
        cand_ref[:, t : t + T] = cand.astype(dt)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("n", "bi", "sr", "fmin", "fmax", "interpret")
)
def pitch_pre_pallas(
    ac: jax.Array,
    hl: jax.Array,
    n: int,
    bi: int,
    sr: float,
    fmin: float,
    fmax: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(B, n) quirked AC + (n,) HanningLag table ->
    (self_lag (B, 2n), freq (B, bi), cand (B, bi) bool), lag-indexed.

    Bit-identical to the XLA block in voxtpu/pitch.py (pinned by
    tests/test_pallas.py); freq is zeroed outside cand."""
    if not pitch_pre_supported(n, bi):
        raise ValueError(f"unsupported shape n={n} bi={bi}")
    B = ac.shape[0]
    dt = ac.dtype
    Bp = _round_up(B, FB)
    if Bp != B:
        ac = jnp.pad(ac, ((0, Bp - B), (0, 0)))

    shl, shr, e_to, e_from = (jnp.asarray(x, dt) for x in _shift_tables())
    hl2 = jnp.asarray(hl, dt)[None, :]  # (1, n)

    table_specs = [
        pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        *[
            pl.BlockSpec((T, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    ]
    sl, freq, cand = pl.pallas_call(
        functools.partial(_kernel, n=n, bi=bi, sr=sr, fmin=fmin, fmax=fmax),
        grid=(Bp // FB,),
        in_specs=[
            pl.BlockSpec((FB, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *table_specs,
        ],
        out_specs=[
            pl.BlockSpec((FB, 2 * n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, bi), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FB, bi), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, 2 * n), dt),
            jax.ShapeDtypeStruct((Bp, bi), dt),
            jax.ShapeDtypeStruct((Bp, bi), dt),
        ],
        interpret=interpret,
    )(ac, hl2, shl, shr, e_to, e_from)
    return sl[:B], freq[:B], cand[:B] != 0.0
