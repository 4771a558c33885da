"""Measure the bucket ladder for small files (VERDICT r3 #6).

--bucket-frames pads every file's frame axis to a multiple of one rung
(default 1024): a 40-frame clip becomes a 1024-frame compute. A ladder
{64, 256, 1024} bounds the compiled-shape count at 3 per config while
padding small files ~16-4x less. This script measures what one small-file
analyze actually costs per rung, on the device this process sees (TPU by
default; CPU via scripts/cpu_env).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bucket_ladder.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from voxtpu.pipeline import (
        AnalysisConfig,
        FormantConfig,
        MfccConfig,
        PitchConfig,
        analyze_frames,
    )

    # The corpus shape class for an 11,025 Hz file at the default 50/10 ms.
    sr = 11025.0
    frame_len, hop = 552, 111
    config = AnalysisConfig(
        sample_rate=sr,
        frame_len=frame_len,
        hop=hop,
        pitch=PitchConfig(threshold=0.2, fmin=60.0, fmax=600.0, max_candidates=32),
        formant=FormantConfig(n_coeffs=13),
        mfcc=MfccConfig(num_coeffs=13, freq_lo=100.0, freq_hi=4000.0),
    )

    rng = np.random.default_rng(0)
    t = np.arange(40 * hop + frame_len) / sr  # a ~0.45 s clip: 40 real frames
    sig = np.sin(2 * np.pi * 180.0 * t) + 0.05 * rng.standard_normal(t.shape)
    real = np.lib.stride_tricks.sliding_window_view(
        sig.astype(np.float32), frame_len
    )[::hop]
    F = real.shape[0]
    print(f"real frames: {F} (frame {frame_len} hop {hop} @ {sr:.0f} Hz)", flush=True)

    def checksummed(f):
        out = analyze_frames(f, config)
        import jax

        leaves = jax.tree_util.tree_flatten(out)[0]
        return jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in leaves])

    fn = jax.jit(checksummed)
    for rung in (64, 256, 1024):
        padded = np.zeros((rung, frame_len), np.float32)
        padded[:F] = real
        x = jax.device_put(jnp.asarray(padded))
        float(np.asarray(fn(x)).sum())  # compile + warm
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            float(np.asarray(fn(x)).sum())
            times.append(time.perf_counter() - t0)
        print(f"rung {rung:5d}: median {np.median(times)*1e3:7.2f} ms "
              f"best {min(times)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
