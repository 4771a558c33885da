"""Sustained long-audio throughput: analyze_long on ~30 min of speech.

Demonstrates the production long-recording path end-to-end on the real chip:
chunked execution with the exact cross-chunk formant carry, one compiled
executable reused across chunks, HBM bounded at one chunk of frames.

Run: python scripts/perf_long_audio.py [minutes] [chunk_frames]
"""

import sys
import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp

    try:
        if jax.default_backend() != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from voxtpu.io_wav import read_wav
    from voxtpu.pipeline import (
        AnalysisConfig,
        FormantConfig,
        MfccConfig,
        PitchConfig,
        analyze_long,
    )

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    chunk_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    frame_len, hop, sr = 4096, 1024, 44100.0
    config = AnalysisConfig(
        sample_rate=sr, frame_len=frame_len, hop=hop,
        pitch=PitchConfig(threshold=0.2, fmin=60.0, fmax=600.0, max_candidates=32),
        formant=FormantConfig(n_coeffs=13),
        mfcc=MfccConfig(num_coeffs=13, freq_lo=100.0, freq_hi=8000.0),
    )

    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    base = np.asarray(wav.samples, dtype=np.float32)
    reps = int(np.ceil(minutes * 60.0 * sr / len(base)))
    samples = np.tile(base, reps)
    audio_s = len(samples) / sr
    print(f"audio={audio_s/60:.1f} min  samples={len(samples):,}  "
          f"chunk_frames={chunk_frames}", flush=True)

    # warmup: compile the chunk executable once on a prefix
    t0 = time.perf_counter()
    _ = jax.tree.map(
        np.asarray,
        analyze_long(samples[: chunk_frames * hop + frame_len], config,
                     chunk_frames=chunk_frames),
    )
    print(f"compile+warmup: {time.perf_counter()-t0:.1f} s", flush=True)

    @jax.jit
    def checksum(out):
        return sum(
            jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0).astype(jnp.float32))
            for v in jax.tree.leaves(out)
        )

    def run(x, label):
        t0 = time.perf_counter()
        out = analyze_long(x, config, chunk_frames=chunk_frames)
        # ONE fused checksum execution + ONE scalar fetch (masked candidate
        # lanes legitimately hold +-inf garbage, hence the isfinite)
        checks = float(np.asarray(checksum(out)))
        dt = time.perf_counter() - t0
        F = int(np.asarray(out["rms"]).shape[0])
        print(f"{label}: frames={F:,}  wall={dt:.2f} s  -> "
              f"{audio_s/dt:,.0f}x real-time  (checksum {checks:.6e})", flush=True)

    run(samples, "host ingress incl. (635 MB through the axon tunnel)")
    dev = jax.device_put(jnp.asarray(samples))
    run(dev, "device-resident samples")


if __name__ == "__main__":
    main()
