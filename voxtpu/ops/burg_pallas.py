"""Pallas kernel: Burg LPC over VMEM-resident prediction buffers.

Reference: lpc_praat_mut (spectrum.rs:101-146). The XLA version re-reads and
re-writes the (B, N) forward/backward buffers from HBM on every order step
(~13 x 4 passes for order 13); here each grid cell holds its 8 frames' b1/b2
in VMEM/registers for the whole recursion — one HBM read of the frames, one
write of the coefficients.

Semantics identical to voxtpu.lpc.burg (pinned by interpret-mode tests),
including the `denum <= 0` status flagging.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxtpu import errors

BLOCK = 8
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, coef_ref, status_ref, *, P: int, N: int):
    dt = x_ref.dtype
    x = x_ref[:]  # (BLOCK, N)
    zcol = jnp.zeros((BLOCK, 1), dtype=dt)
    b1 = jnp.concatenate([x[:, : N - 1], zcol], axis=1)
    b2 = jnp.concatenate([x[:, 1:], zcol], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, N), 1)

    coeffs = [zcol] * P
    aa = [zcol] * P
    bad_any = zcol > 1.0  # all-False (BLOCK, 1)

    for i in range(1, P + 1):
        m = N - i
        mask = col < m
        num = jnp.sum(jnp.where(mask, b1 * b2, 0.0), axis=1, keepdims=True)
        denum = jnp.sum(
            jnp.where(mask, b1 * b1 + b2 * b2, 0.0), axis=1, keepdims=True
        )
        bad = denum <= 0.0
        bad_any = bad_any | bad
        ci = 2.0 * num / jnp.where(bad, 1.0, denum)

        new_head = [aa[j - 1] - ci * aa[i - j - 1] for j in range(1, i)]
        for j in range(1, i):
            coeffs[j - 1] = new_head[j - 1]
        coeffs[i - 1] = ci

        if i < P:
            for j in range(i):
                aa[j] = coeffs[j]
            b1_new = b1 - ci * b2
            b2 = jnp.concatenate([b2[:, 1:], zcol], axis=1) - ci * jnp.concatenate(
                [b1[:, 1:], zcol], axis=1
            )
            b1 = b1_new

    lane = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, LANES), 1)
    out = jnp.zeros((BLOCK, LANES), dtype=dt)
    for j in range(P):
        out = jnp.where(lane == j, -coeffs[j], out)  # final sign flip
    coef_ref[:] = out
    status_ref[:] = jnp.where(
        lane == 0, jnp.where(bad_any, 1.0, 0.0), jnp.zeros((BLOCK, LANES), dtype=dt)
    )


@functools.partial(jax.jit, static_argnames=("n_coeffs", "interpret"))
def burg_pallas(
    x: jax.Array, n_coeffs: int, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Burg LPC for (B, N) frames. Returns (coeffs (B, P), status (B,))."""
    B, N = x.shape
    dt = x.dtype
    P = int(n_coeffs)
    if P >= LANES:
        raise ValueError(f"order {P} exceeds lane capacity")

    Bp = _round_up(B, BLOCK)
    if Bp != B:
        x = jnp.pad(x, [(0, Bp - B), (0, 0)], constant_values=1.0)

    kernel = functools.partial(_kernel, P=P, N=N)
    coef, status = pl.pallas_call(
        kernel,
        grid=(Bp // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK, N), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, LANES), dt),
            jax.ShapeDtypeStruct((Bp, LANES), dt),
        ],
        interpret=interpret,
    )(x)

    coeffs = coef[:B, :P]
    st = jnp.where(status[:B, 0] > 0.5, errors.LPC_DENUM_NONPOS, 0).astype(jnp.int32)
    return coeffs, st
