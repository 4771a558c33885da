"""Four-step Cooley-Tukey real FFT power + inverse cosine transform as MXU matmuls.

XLA's TPU FFT runs on the VPU and is the autocorrelation stage's floor
(PERFORMANCE.md). Decomposing the nfft-point transform as N1 x N2 (N2 = 128,
the MXU/lane width) turns both directions into chains of small dense matmuls
plus elementwise twiddles — measured 1.8x faster than rfft+irfft on v5e at
full f32 accuracy (scripts/perf_fft_ct.py: 10.2 ms vs 18.5 ms per 5121
frames of nfft=8192, max err 2e-7 with HIGHEST matmul precision; the chain is
HBM-bound, so the 6-pass f32 matmuls cost almost nothing over 1-pass bf16).

Layout contract: the forward power arrives PERMUTED, P[k1, k2] with
k = k2*N1 + k1 (the four-step output order). Consumers never un-permute:
- the inverse cosine transform takes the permuted layout directly (its
  tables absorb the permutation);
- the n-point half spectrum (MFCC's input, X_n[j] == X_2n[2j] for
  zero-padded real frames) is the even-k1 rows: j = k2*(N1/2) + k1/2 — a
  strided slice + (tiny) transpose, no gather.

Forward derivation (x viewed (N1, N2) row-major, n = n1*N2 + n2,
k = k2*N1 + k1):
  X[k2*N1 + k1] = sum_{n2} W_N^{n2 k1} (sum_{n1} x[n1,n2] W_N1^{n1 k1})
                  * W_N2^{n2 k2}
Stage 1 contracts n1 (real input: one cos + one sin matmul; only the
occupied rows of the zero-padded frame participate), stage 2 is the
elementwise twiddle, stage 3 contracts n2 (4 real matmuls).

Inverse (AC of the full symmetric power, l = l1 + N2*l2):
  theta = 2*pi*k*l/N = a + b + c, a = 2*pi*k2*l1/N2, b = 2*pi*k1*l1/N,
  c = 2*pi*k1*l2/N1 (the k2*l2 cross term is an integer multiple of 2*pi);
  ac[l] = (1/N) sum_{k1} (Ca cb - Sa sb) cos(c) - (Ca sb + Sa cb) sin(c),
  Ca/Sa = P @ cos/sin(a) contracting k2.

Reference semantics: produces exactly rfft(x, nfft) power / irfft lags
(quirk correction stays in voxtpu.autocorr).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["ct_supported", "ct_power", "ct_half_power", "ct_autocorr"]

N2 = 128  # lane width; stage-3 matmul dimension


def ct_supported(nfft: int) -> bool:
    """CT path applies when nfft splits as N1 x 128 with even N1 (the even-k1
    half-spectrum extraction) — every power of two >= 256."""
    return nfft % N2 == 0 and (nfft // N2) % 2 == 0


# Host-side (NumPy) table caches. The cached values MUST be NumPy, never
# jnp arrays: jnp.asarray inside a jit trace yields a tracer, and an
# lru_cache populated during one trace would leak that tracer into every
# later trace (UnexpectedTracerError on the second differently-shaped jit).
# jnp.asarray at the use site embeds them as constants per trace, free.


@functools.lru_cache(maxsize=8)
def _fwd_tables_np(nfft: int, n: int):
    N1 = nfft // N2
    rows = -(-n // N2)
    n1 = np.arange(rows)
    k1 = np.arange(N1)
    w1 = -2.0 * np.pi * np.outer(n1, k1) / N1
    n2 = np.arange(N2)
    k2 = np.arange(N2)
    w2 = -2.0 * np.pi * np.outer(n2, k2) / N2
    tw = -2.0 * np.pi * np.outer(n2, k1) / nfft  # (n2, k1) layout
    return (np.cos(w1), np.sin(w1), np.cos(w2), np.sin(w2),
            np.cos(tw), np.sin(tw))


@functools.lru_cache(maxsize=8)
def _inv_tables_np(nfft: int, n_lags: int):
    N1 = nfft // N2
    L2 = -(-n_lags // N2)
    k1 = np.arange(N1)
    k2 = np.arange(N2)
    l1 = np.arange(N2)
    l2 = np.arange(L2)
    ca = np.cos(2 * np.pi * np.outer(k2, l1) / N2)
    sa = np.sin(2 * np.pi * np.outer(k2, l1) / N2)
    cb = np.cos(2 * np.pi * np.outer(k1, l1) / nfft)
    sb = np.sin(2 * np.pi * np.outer(k1, l1) / nfft)
    cc = np.cos(2 * np.pi * np.outer(k1, l2) / N1)
    sc = np.sin(2 * np.pi * np.outer(k1, l2) / N1)
    return (ca, sa, cb, sb, cc, sc)


def _fwd_tables(nfft: int, n: int, dtype_name: str):
    dt = jnp.dtype(dtype_name)
    return tuple(jnp.asarray(m, dt) for m in _fwd_tables_np(nfft, n))


def _inv_tables(nfft: int, n_lags: int, dtype_name: str):
    dt = jnp.dtype(dtype_name)
    return tuple(jnp.asarray(m, dt) for m in _inv_tables_np(nfft, n_lags))


_DN = (((1,), (0,)), ((), ()))
_PREC = jax.lax.Precision.HIGHEST


def ct_power(x: jax.Array, nfft: int) -> jax.Array:
    """(B, n) real frames -> (B, N1, N2) power of rfft(x, nfft), permuted
    k = k2*N1 + k1. Trailing zero-padding is implicit (only the occupied
    rows of the (N1, N2) view are contracted)."""
    B, n = x.shape
    N1 = nfft // N2
    rows = -(-n // N2)
    c1, s1, c2, s2, tc, ts = _fwd_tables(nfft, n, x.dtype.name)
    if rows * N2 != n:
        x = jnp.pad(x, ((0, 0), (0, rows * N2 - n)))
    xm = x.reshape(B, rows, N2)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=_DN,
                            precision=_PREC)
    ar = dot(xm, c1)  # (B, n2, k1)
    ai = dot(xm, s1)
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc
    xr = dot(br, c2) - dot(bi, s2)  # (B, k1, k2)
    xi = dot(br, s2) + dot(bi, c2)
    return xr * xr + xi * xi


def ct_half_power(p: jax.Array, n_half: int) -> jax.Array:
    """Natural-order half power of the (nfft/2)-point spectrum from the
    permuted (B, N1, N2) power: the even-k1 rows are the even nfft bins
    (j = k2*(N1/2) + k1/2), i.e. X_{nfft/2}[j] for zero-padded real input."""
    B, N1, _ = p.shape
    even = p[:, 0::2, :]  # (B, N1/2, N2), j = k2*(N1/2) + k1h
    nat = even.transpose(0, 2, 1).reshape(B, -1)  # j ascending
    return nat[:, :n_half]


def ct_autocorr(p: jax.Array, n_lags: int) -> jax.Array:
    """Permuted (B, N1, N2) power -> first n_lags natural-order lags of
    irfft(power, nfft) (the linear autocorrelation)."""
    B, N1, _ = p.shape
    nfft = N1 * N2
    ca, sa, cb, sb, cc, sc = _inv_tables(nfft, n_lags, p.dtype.name)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=(((2,), (0,)), ((), ())),
                            precision=_PREC)
    Ca = dot(p, ca)  # (B, k1, l1)
    Sa = dot(p, sa)
    U = Ca * cb - Sa * sb
    V = Ca * sb + Sa * cb
    dot2 = functools.partial(jax.lax.dot_general, dimension_numbers=_DN,
                             precision=_PREC)
    acU = dot2(U, cc)  # (B, l1, l2)
    acV = dot2(V, sc)
    ac = (acU - acV) / nfft
    return ac.transpose(0, 2, 1).reshape(B, -1)[:, :n_lags]
