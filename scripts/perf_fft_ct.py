"""Measure: XLA rfft(8192) vs 4-step Cooley-Tukey matmul decomposition (MXU).

VERDICT r1 #3a / ROADMAP: "Measure XLA FFT against a 64x128 Cooley-Tukey
matmul decomposition first". The pipeline's forward transform is
rfft(frames, 8192) -> |.|^2 (autocorr.py:66-67), feeding both the pitch
autocorrelation and the MFCC filterbank.

Four-step CT with N = N1*N2 (64*128), x viewed as (N1, N2) row-major:
  X[k2*N1 + k1] = sum_{n2} W_N^{n2 k1} (sum_{n1} x[n1, n2] W_N1^{n1 k1})
                  * W_N2^{n2 k2}
Stage 1 is a (N1 x N1) matmul over the n1 axis (real input: one cos and one
sin matmul); stage 2 an elementwise twiddle; stage 3 a (N2 x N2) complex
matmul (4 real matmuls). The output power arrives in PERMUTED order
k = k2*N1 + k1 — downstream consumers are matmuls (mel filterbank) or the
inverse transform, so the permutation folds into host-built constants and is
never materialized.

Run on the real chip: python scripts/perf_fft_ct.py [reps]
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, x, iters=5):
    import jax

    out = fn(x)
    np.asarray(jax.tree.flatten(out)[0][0]).ravel()[:1]
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        np.asarray(jax.tree.flatten(out)[0][0]).ravel()[:4].sum()
        best = min(best, time.perf_counter() - t0)
    return best


def ct_tables(N1, N2, dtype):
    import jax.numpy as jnp

    N = N1 * N2
    n1 = np.arange(N1)
    k1 = np.arange(N1)
    w1 = -2.0 * np.pi * np.outer(n1, k1) / N1
    n2 = np.arange(N2)
    k2 = np.arange(N2)
    w2 = -2.0 * np.pi * np.outer(n2, k2) / N2
    tw = -2.0 * np.pi * np.outer(k1, n2) / N  # twiddle W_N^{k1 n2}
    return (
        jnp.asarray(np.cos(w1), dtype), jnp.asarray(np.sin(w1), dtype),
        jnp.asarray(np.cos(w2), dtype), jnp.asarray(np.sin(w2), dtype),
        jnp.asarray(np.cos(tw), dtype), jnp.asarray(np.sin(tw), dtype),
    )


def make_ct_power(N1, N2, dtype, zero_pad_from=None, precision=None, accum=None):
    """Returns fn: (B, n) real frames -> (B, N1, N2) power, permuted order
    k = k2*N1 + k1. zero_pad_from: actual frame length (n <= N1*N2); the
    trailing zeros are *not* materialized — stage 1 contracts only the first
    ceil(n/N2) rows of the (N1, N2) view."""
    import jax
    import jax.numpy as jnp

    c1, s1, c2, s2, tc, ts = ct_tables(N1, N2, dtype)
    n = zero_pad_from if zero_pad_from is not None else N1 * N2
    rows = -(-n // N2)  # ceil: occupied rows of the (N1, N2) view
    c1 = c1[:rows]
    s1 = s1[:rows]

    tcT, tsT = tc.T, ts.T  # (n2, k1) layout tables

    def fwd_power(x):  # (B, n)
        B = x.shape[0]
        if rows * N2 != n:
            x = jnp.pad(x, ((0, 0), (0, rows * N2 - n)))
        xm = x.reshape(B, rows, N2)
        dn = (((1,), (0,)), ((), ()))
        dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                                precision=precision,
                                preferred_element_type=accum)
        # stage 1: DFT over n1; result layout (B, n2, k1) — no transposes.
        ar = dot(xm, c1)
        ai = dot(xm, s1)
        # stage 2: twiddle (elementwise complex), (n2, k1) tables
        br = ar * tcT - ai * tsT
        bi = ar * tsT + ai * tcT
        # stage 3: DFT over n2 (contract dim 1): -> (B, k1, k2)
        xr = dot(br, c2) - dot(bi, s2)
        xi = dot(br, s2) + dot(bi, c2)
        return xr * xr + xi * xi  # (B, N1=k1, N2=k2); k = k2*N1 + k1

    return fwd_power


def make_ct_inverse(N1, N2, n_lags, dtype, precision=None):
    """Inverse: permuted power (B, N1=k1, N2=k2) -> natural-order AC lags
    (B, n_lags). Derivation (k = k2*N1 + k1, l = l1 + N2*l2, N = N1*N2):
      theta = 2*pi*k*l/N = a + b + c   with a = 2*pi*k2*l1/N2 (k2*N1*l1/N),
        b = 2*pi*k1*l1/N (twiddle), c = 2*pi*k1*l2/N1 (k1*N2*l2/N);
      the k2*l2 cross term is an integer multiple of 2*pi and drops.
      ac[l] = (1/N) sum_k P[k] cos(theta)
            = (1/N) sum_{k1} U[k1,l1] cos(c) - V[k1,l1] sin(c)
      U = Ca*cos(b) - Sa*sin(b), V = Ca*sin(b) + Sa*cos(b),
      Ca/Sa = P @ cos/sin(a)  (contract k2).
    All matmuls + elementwise; the only data movement is the final
    (l1, l2) -> l1 + N2*l2 reorder, a (B, n_lags) reshape/transpose."""
    import jax
    import jax.numpy as jnp

    N = N1 * N2
    L2 = -(-n_lags // N2)
    k1 = np.arange(N1)
    k2 = np.arange(N2)
    l1 = np.arange(N2)
    l2 = np.arange(L2)
    ca = np.cos(2 * np.pi * np.outer(k2, l1) / N2)
    sa = np.sin(2 * np.pi * np.outer(k2, l1) / N2)
    cb = np.cos(2 * np.pi * np.outer(k1, l1) / N)
    sb = np.sin(2 * np.pi * np.outer(k1, l1) / N)
    cc = np.cos(2 * np.pi * np.outer(k1, l2) / N1)
    sc = np.sin(2 * np.pi * np.outer(k1, l2) / N1)
    ca, sa, cb, sb, cc, sc = (jnp.asarray(m, dtype) for m in (ca, sa, cb, sb, cc, sc))
    dn = (((1,), (0,)), ((), ()))
    dn_k1 = (((1,), (0,)), ((), ()))

    def inv(p):  # (B, N1, N2) permuted power
        Ca = jax.lax.dot_general(p, ca, (((2,), (0,)), ((), ())), precision=precision)
        Sa = jax.lax.dot_general(p, sa, (((2,), (0,)), ((), ())), precision=precision)
        U = Ca * cb - Sa * sb  # (B, k1, l1)
        V = Ca * sb + Sa * cb
        acU = jax.lax.dot_general(U, cc, dn_k1, precision=precision)  # (B, l1, l2)
        acV = jax.lax.dot_general(V, sc, dn_k1, precision=precision)
        ac = (acU - acV) / N
        # l = l1 + N2*l2: transpose to (B, l2, l1), flatten, trim
        return ac.transpose(0, 2, 1).reshape(p.shape[0], -1)[:, :n_lags]

    del dn
    return inv


def main():
    import jax
    import jax.numpy as jnp

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    n, hop, sr = 4096, 1024, 44100.0
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.windows import hann

    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    frames = jax.device_put(frames * jnp.asarray(hann(n), dtype=jnp.float32))
    B = frames.shape[0]
    print(f"frames={B}", flush=True)

    nfft = 2 * n  # 8192

    def xla_power(x):
        spec = jnp.fft.rfft(x, n=nfft, axis=-1)
        return spec.real**2 + spec.imag**2

    ct64 = make_ct_power(64, 128, jnp.float32, zero_pad_from=n)
    ct128 = make_ct_power(128, 64, jnp.float32, zero_pad_from=n)

    # correctness first (on-chip f32): compare a few bins
    p_ref = np.asarray(jax.jit(xla_power)(frames[:4]))
    p_ct = np.asarray(jax.jit(ct64)(frames[:4]))  # (4, 64, 128) permuted
    # natural k = k2*64 + k1 -> p_ct[b, k1, k2]
    k = np.arange(nfft // 2 + 1)
    k1, k2 = k % 64, k // 64
    got = p_ct[:, k1, k2]
    err = np.abs(got - p_ref) / (np.abs(p_ref).max())
    print(f"ct64x128 max rel err vs rfft: {err.max():.2e}", flush=True)

    # --- full AC chains: natural-order 4096-lag autocorrelation
    inv64 = make_ct_inverse(64, 128, n, jnp.float32)

    def xla_ac(x):
        spec = jnp.fft.rfft(x, n=nfft, axis=-1)
        power = spec.real**2 + spec.imag**2
        return jnp.fft.irfft(power, n=nfft, axis=-1)[..., :n]

    def ct_ac(x):
        return inv64(ct64(x))

    # correctness of the chain
    a_ref = np.asarray(jax.jit(xla_ac)(frames[:4]))
    a_ct = np.asarray(jax.jit(ct_ac)(frames[:4]))
    print(f"ct AC chain max abs err vs fft: "
          f"{np.abs(a_ct - a_ref).max() / np.abs(a_ref).max():.2e}", flush=True)

    # bf16 variants (tables + inputs bf16, f32 accum via preferred type is
    # implicit for bf16 matmuls on TPU)
    ct64_bf = make_ct_power(64, 128, jnp.bfloat16, zero_pad_from=n)
    inv64_bf = make_ct_inverse(64, 128, n, jnp.bfloat16)

    def ct_ac_bf(x):
        return inv64_bf(ct64_bf(x.astype(jnp.bfloat16)).astype(jnp.bfloat16))

    a_bf = np.asarray(jax.jit(ct_ac_bf)(frames[:4]), dtype=np.float32)
    print(f"ct bf16 AC chain max abs err: "
          f"{np.abs(a_bf - a_ref).max() / np.abs(a_ref).max():.2e}", flush=True)

    # bf16 data with f32 accumulation: tables+inputs bf16, dot accumulates
    # f32 via preferred_element_type (the lossy-mode candidate)
    ct64_bfacc = make_ct_power(64, 128, jnp.bfloat16, zero_pad_from=n,
                               accum=jnp.float32)
    inv64_f32 = make_ct_inverse(64, 128, n, jnp.float32)

    def ct_ac_bfacc(x):
        p = ct64_bfacc(x.astype(jnp.bfloat16))  # f32 accumulators throughout
        return inv64_f32(p)

    a_bfacc = np.asarray(jax.jit(ct_ac_bfacc)(frames[:4]))
    print(f"ct bf16-in/f32-acc AC chain max abs err: "
          f"{np.abs(a_bfacc - a_ref).max() / np.abs(a_ref).max():.2e}", flush=True)

    # precision variants: DEFAULT = 1-pass bf16 matmul (the 1.75e-3 error
    # above), HIGH = 3-pass, HIGHEST = 6-pass (~true f32)
    extra = [("ct AC bf16/f32acc", ct_ac_bfacc)]
    for pname, prec in [("HIGH", jax.lax.Precision.HIGH),
                        ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        fwd_p = make_ct_power(64, 128, jnp.float32, zero_pad_from=n, precision=prec)
        inv_p = make_ct_inverse(64, 128, n, jnp.float32, precision=prec)

        def chain(x, f=fwd_p, i=inv_p):
            return i(f(x))

        a_p = np.asarray(jax.jit(chain)(frames[:4]))
        print(f"ct {pname} AC chain max abs err: "
              f"{np.abs(a_p - a_ref).max() / np.abs(a_ref).max():.2e}", flush=True)
        extra.append((f"ct AC {pname}", chain))

    # --- timing: amortize the fetch with an 8x fori_loop over the op
    def looped(f):
        def g(x):
            def body(i, acc):
                return acc + jnp.sum(f(x + i.astype(x.dtype)))
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))
        return g

    for name, fn in [("xla rfft+|.|^2", xla_power), ("ct 64x128", ct64),
                     ("ct 128x64", ct128), ("xla AC chain", xla_ac),
                     ("ct AC chain", ct_ac), ("ct AC bf16", ct_ac_bf)] + extra:
        t = timeit(jax.jit(looped(fn)), frames)
        print(f"{name:16s}: {t*1e3/8:8.2f} ms/op  ({t*1e3:7.1f} ms /8)", flush=True)


if __name__ == "__main__":
    main()
