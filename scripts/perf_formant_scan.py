"""A/B harness for the McCandless formant-scan Pallas kernel.

Times `mccandless_scan_pallas` standalone on the real chip over realistic
inputs (the actual resonance candidates of the tiled two-vowels recording,
order 13, R=32), fused-checksum synchronized. Optionally times a variant
module side by side:

  git show HEAD:voxtpu/ops/formant_scan_pallas.py > /tmp/scan_baseline.py
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_formant_scan.py /tmp/scan_baseline.py
"""

import importlib.util
import sys
import time

import numpy as np


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.formants import MALE_FORMANT_ESTIMATES, formant_candidates
    from voxtpu.frame import frame_signal
    from voxtpu.io_wav import read_wav

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    n, hop, sr, order = 4096, 1024, 44100.0, 13
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    sig = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = frame_signal(jnp.asarray(sig, dtype=jnp.float32), n, hop)
    rfreq, rbw, _ = jax.jit(
        lambda fr: formant_candidates(fr, sr, order)
    )(frames)
    rfreq = jax.device_put(np.asarray(rfreq))
    rbw = jax.device_put(np.asarray(rbw))
    est_f = jnp.asarray(MALE_FORMANT_ESTIMATES, dtype=jnp.float32)
    est_b = jnp.ones_like(est_f)
    print(f"frames={rfreq.shape[0]} R={rfreq.shape[1]} L={est_f.shape[0]}",
          flush=True)

    def timeit(fn, iters=12):
        out = fn(rfreq, rbw, est_f, est_b)
        chk = np.asarray(out)
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(rfreq, rbw, est_f, est_b)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best, chk

    import os
    LOOPS = int(os.environ.get("LOOPS", "16"))
    print(f"LOOPS={LOOPS}", flush=True)

    def checksummed(scan_fn):
        # Loop-amortized: LOOPS sequential scans inside one jit resolve the
        # kernel's device time through the ~28 ms tunnel floor. The 1e-36*chk
        # input perturbation ties each iteration to the last so XLA cannot
        # CSE/hoist them (0.0*chk is algebraically foldable; 1e-36*chk is
        # not, and at f32 it is absorbed exactly: rf + ~1e-28 == rf).
        @jax.jit
        def g(rf, rb, ef, eb):
            def body(_, chk):
                f, b = scan_fn(rf + 1e-36 * chk, rb, ef, eb)
                return jnp.sum(f.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))

            return jax.lax.fori_loop(0, LOOPS, body, jnp.float32(0.0))
        return g

    from voxtpu.ops.formant_scan_pallas import mccandless_scan_pallas

    t_cur, chk_cur = timeit(checksummed(mccandless_scan_pallas))
    print(f"current : {t_cur*1e3:8.2f} ms  checksum={chk_cur:.6f}", flush=True)

    if len(sys.argv) > 1:
        base = load_module(sys.argv[1], "scan_baseline")
        t_b, chk_b = timeit(checksummed(base.mccandless_scan_pallas))
        print(f"variant : {t_b*1e3:8.2f} ms  checksum={chk_b:.6f}", flush=True)
        print(f"checksum diff = {abs(float(chk_cur) - float(chk_b)):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
