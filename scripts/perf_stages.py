"""Per-stage TPU timing: which stage of the pipeline is hot?

Times each feature in isolation (pitch / formants / mfcc / rms) plus the
fused pipeline, with results fetched to host (device->host fetch forces real
synchronization — `block_until_ready` alone can under-report under the axon
tunnel). Run on the real chip: `python scripts/perf_stages.py [reps]`.
"""

import sys
import time

import numpy as np


def timeit(fn, frames, iters=5):
    # ONE fused scalar checksum per run: each np.asarray is a ~25 ms tunnel
    # roundtrip, and fetching whole feature arrays ships megabytes — both
    # would swamp the device time being measured.
    out = fn(frames)
    np.asarray(out).ravel()[:1]  # warm + sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(fn(frames)).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.pipeline import (
        AnalysisConfig,
        FormantConfig,
        MfccConfig,
        PitchConfig,
        analyze_frames,
    )

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    frame_len, hop, sr = 4096, 1024, 44100.0
    wav = read_wav("tests/fixtures/sample-two_vowels.wav")
    signal = np.tile(np.asarray(wav.samples, dtype=np.float32), reps)
    frames = jax.device_put(
        frame_signal(jnp.asarray(signal, dtype=jnp.float32), frame_len, hop)
    )
    audio = frames.shape[0] * hop / sr
    print(f"frames={frames.shape[0]} audio={audio:.1f}s", flush=True)

    off = dict(enabled=False)
    variants = {
        "rms only": AnalysisConfig(sr, frame_len, hop, PitchConfig(**off), FormantConfig(**off), MfccConfig(**off)),
        "mfcc": AnalysisConfig(sr, frame_len, hop, PitchConfig(**off), FormantConfig(**off), MfccConfig(num_coeffs=13, freq_hi=8000.0)),
        "formants": AnalysisConfig(sr, frame_len, hop, PitchConfig(**off), FormantConfig(n_coeffs=13), MfccConfig(**off)),
        "pitch": AnalysisConfig(sr, frame_len, hop, PitchConfig(max_candidates=32), FormantConfig(**off), MfccConfig(**off)),
        "full": AnalysisConfig(sr, frame_len, hop, PitchConfig(max_candidates=32), FormantConfig(n_coeffs=13), MfccConfig(num_coeffs=13, freq_hi=8000.0)),
    }
    for name, cfg in variants.items():

        def checksummed(f, c=cfg):
            out = analyze_frames(f, c)
            leaves = jax.tree_util.tree_flatten(out)[0]
            return jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in leaves]).sum()

        t = timeit(jax.jit(checksummed), frames)
        print(f"{name:10s}: {t*1e3:9.2f} ms  -> {audio/t:10.0f} x real-time", flush=True)


if __name__ == "__main__":
    main()
