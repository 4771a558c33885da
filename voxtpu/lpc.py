"""Batched LPC: Levinson-Durbin and Burg ("praat") recursions.

Reference: ``/root/reference/src/spectrum.rs:50-147``. The reference runs one
frame at a time, allocation-free, with sequential inner loops. Here both
recursions are *batched over frames* — the order recursion is inherently
sequential (orders 10-26 in practice, BASELINE configs), so it is unrolled at
trace time with static slicing, while every inner reduction runs vectorized
across the whole batch on the VPU. XLA fuses each order step into a handful of
fused elementwise+reduce kernels; there is no per-frame host loop anywhere.

Failure handling: the reference returns `VoxBoxError::LPC("Denum was <= 0.0")`
(spectrum.rs:123-125). A batched kernel must not abort on one bad frame, so
`burg` returns a per-frame status bitmask instead (see voxtpu.errors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from voxtpu import errors
from voxtpu.backend import default_backend

__all__ = ["levinson", "burg", "LPCSolver"]


class LPCSolver:
    """Stateful convenience wrapper mirroring the reference's `LPCSolver`
    (spectrum.rs:14-48). The reference's version exists to pre-carve a
    workspace; under XLA, buffers are compiler-managed, so this is a thin
    order-carrying wrapper over `levinson` kept for API-migration parity.
    """

    def __init__(self, n_coeffs: int):
        self.n_coeffs = int(n_coeffs)
        self._lpc = None

    def solve(self, ac: jax.Array) -> None:
        self._lpc = levinson(ac, self.n_coeffs)

    def lpc(self) -> jax.Array:
        if self._lpc is None:
            raise RuntimeError("call solve() first")
        return self._lpc


def levinson(ac: jax.Array, n_coeffs: int) -> jax.Array:
    """Levinson-Durbin recursion on an autocorrelation sequence.

    Reference-exact transcription of `LPC::lpc_mut` (spectrum.rs:63-84):
    returns `a` of shape (..., n_coeffs+1) with a[0] = 1 and a[1..] the
    prediction coefficients (the reference's `ac` output buffer).

    Args:
      ac: (..., m) autocorrelation values, m >= n_coeffs + 1.
      n_coeffs: LPC order (static).
    """
    ac = jnp.asarray(ac)
    if ac.shape[-1] < n_coeffs + 1:
        raise ValueError("need at least n_coeffs+1 autocorrelation values")

    batch = ac.shape[:-1]
    one = jnp.ones(batch + (1,), dtype=ac.dtype)
    a = one  # running coefficient array, grows by one per order
    err = ac[..., 0]

    for i in range(1, n_coeffs + 1):
        # acc = r[i] + sum_{j=1}^{i-1} a[j] * r[i-j]
        acc = ac[..., i]
        if i > 1:
            # a[..., 1:i] dot r[..., i-1:0:-1]
            acc = acc + jnp.sum(a[..., 1:i] * ac[..., 1:i][..., ::-1], axis=-1)
        k = -acc / err
        if i > 1:
            # a[j] += k * a_old[i-j] for j in 1..i-1  (reversed slice)
            body = a[..., 1:i] + k[..., None] * a[..., 1:i][..., ::-1]
        else:
            body = a[..., 1:i]
        a = jnp.concatenate([one, body, k[..., None]], axis=-1)
        err = err * (1.0 - k * k)

    return a


def burg(x: jax.Array, n_coeffs: int, backend: str | None = None) -> tuple[jax.Array, jax.Array]:
    """Burg's method LPC on (windowed) samples, reference-exact.

    Transcribes `lpc_praat_mut` (spectrum.rs:101-146) including its
    idiosyncratic forward/backward buffer initialization:

        b1 = [x[0], x[1], .., x[n-2], _]
        b2 = [x[1], x[2], .., x[n-1], _]

    and the in-place update order in which `b2[k]` reads the *pre-update*
    `b1[k+1]` (spectrum.rs:135-138), which vectorizes exactly as a
    shift-and-subtract on the old buffers.

    Returns:
      (coeffs, status): coeffs (..., n_coeffs) — already sign-flipped as in
      the reference (spectrum.rs:142-144); status (...,) int32 bitmask with
      `errors.LPC_DENUM_NONPOS` set for frames where any order hit
      `denum <= 0`. Flagged frames contain best-effort values (the reference
      aborts the frame instead).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    p = int(n_coeffs)
    if n < 2:
        raise ValueError("burg needs at least 2 samples per frame")
    batch = x.shape[:-1]
    dt = x.dtype

    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret") and len(batch) == 1:
        from voxtpu.ops.burg_pallas import burg_pallas

        return burg_pallas(x, p, interpret=backend == "pallas_interpret")

    zeros1 = jnp.zeros(batch + (1,), dtype=dt)
    b1 = jnp.concatenate([x[..., : n - 1], zeros1], axis=-1)
    b2 = jnp.concatenate([x[..., 1:], zeros1], axis=-1)

    coeffs = jnp.zeros(batch + (p,), dtype=dt)
    aa = jnp.zeros(batch + (p,), dtype=dt)
    status = jnp.zeros(batch, dtype=jnp.int32)

    for i in range(1, p + 1):
        m = n - i  # active sample count this order (k in 0..m-1)
        num = jnp.sum(b1[..., :m] * b2[..., :m], axis=-1)
        denum = jnp.sum(b1[..., :m] ** 2 + b2[..., :m] ** 2, axis=-1)

        bad = denum <= 0
        status = jnp.where(bad, status | errors.LPC_DENUM_NONPOS, status)
        safe_denum = jnp.where(bad, jnp.ones_like(denum), denum)
        ci = 2.0 * num / safe_denum

        # coeffs[i-1] = ci, then coeffs[j-1] = aa[j-1] - ci*aa[i-j-1], j in 1..i-1
        head = aa[..., : i - 1] - ci[..., None] * aa[..., : i - 1][..., ::-1]
        coeffs = jnp.concatenate([head, ci[..., None], coeffs[..., i:]], axis=-1)

        if i < p:
            aa = jnp.concatenate([coeffs[..., :i], aa[..., i:]], axis=-1)
            c = ci[..., None]
            b1_new = b1 - c * b2
            b2_new = jnp.concatenate([b2[..., 1:], zeros1], axis=-1) - c * jnp.concatenate(
                [b1[..., 1:], zeros1], axis=-1
            )
            b1, b2 = b1_new, b2_new

    return -coeffs, status
