"""Benchmark: pitch+formant+MFCC throughput, audio-seconds/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's own bench_pitch comment
(/root/reference/benches/periodic.rs:23-25) — 13,197,760 ns for one
4096-sample 44.1 kHz frame (92.9 ms of audio) of *pitch alone*, i.e. ~7.04x
real-time on one core. We run the full pipeline (pitch candidates + Burg LPC
formant tracking + MFCC + RMS) on the same frame size and report
audio-seconds processed per wall-second per chip.
"""

import json

import time

import numpy as np


def main():
    import os

    import jax
    import jax.numpy as jnp  # noqa: F401

    # Persistent compilation cache: the full-pipeline compile takes minutes
    # through the remote AOT tunnel; cache it across runs.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.pipeline import (
        AnalysisConfig,
        FormantConfig,
        MfccConfig,
        PitchConfig,
        analyze_frames,
    )

    frame_len = 4096  # the reference bench frame (benches/periodic.rs:15-22)
    hop = 1024
    sr = 44100.0

    config = AnalysisConfig(
        sample_rate=sr,
        frame_len=frame_len,
        hop=hop,
        pitch=PitchConfig(threshold=0.2, fmin=60.0, fmax=600.0, max_candidates=32),
        formant=FormantConfig(n_coeffs=13),
        mfcc=MfccConfig(num_coeffs=13, freq_lo=100.0, freq_hi=8000.0),
    )

    # Real speech: tile the bundled two-vowels recording (44.1 kHz).
    try:
        wav = read_wav(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tests", "fixtures", "sample-two_vowels.wav",
            )
        )
        samples = np.asarray(wav.samples, dtype=np.float32)
    except Exception:
        t = np.arange(sr * 3, dtype=np.float32) / sr
        samples = np.sin(2 * np.pi * 150 * t).astype(np.float32)

    reps = 126  # ~357 s of audio — a realistic corpus batch; fixed dispatch
    # latency (~25 ms through the axon tunnel) amortizes at this scale
    signal = np.tile(samples, reps)
    frames = frame_signal(jnp.asarray(signal, dtype=jnp.float32), frame_len, hop)
    frames = jax.device_put(frames)
    n_frames = frames.shape[0]
    audio_seconds = n_frames * hop / sr

    def checksummed(f):
        # One fused checksum over every output: forces true synchronization
        # (a bare block_until_ready can under-report under remote-execution
        # tunnels) with a single device->host roundtrip.
        out = analyze_frames(f, config)
        leaves = jax.tree_util.tree_flatten(out)[0]
        return jnp.stack([jnp.sum(l.astype(jnp.float32)) for l in leaves])

    fn = jax.jit(checksummed)

    def run_and_fetch():
        return float(np.asarray(fn(frames)).sum())

    run_and_fetch()  # compile + warmup

    # Median of 9: robust to tunnel jitter in both directions (best-of-N
    # overstates by riding lucky dispatch latency; VERDICT r1 weak #4).
    iters = 9
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run_and_fetch()
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))

    # --- companion measurements (VERDICT r3 #5): the headline blends ~26 ms
    # of fixed axon-tunnel dispatch+fetch into every run; recording the
    # compute separately keeps round-over-round comparisons legible.

    # Tunnel floor: a near-zero-compute dispatch + one scalar fetch.
    tiny = jax.jit(lambda s: s + 1.0)
    seed = jax.device_put(jnp.float32(0.0))
    float(np.asarray(tiny(seed)))  # compile + warm
    floor_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(tiny(seed)))
        floor_times.append(time.perf_counter() - t0)
    tunnel_floor_ms = float(np.median(floor_times)) * 1e3

    # Sustained (streaming): K data-tied pipeline invocations inside ONE jit,
    # one checksum fetch — the dispatch+fetch amortizes to ~nothing, which is
    # what a local-PJRT deployment (or a streaming consumer) sees. The
    # 1e-36*carry tie is f32-exact absorption XLA cannot fold (0.0*carry is
    # algebraically foldable and reads as the tunnel floor — CLAUDE.md).
    K = 8

    def chained(f):
        def body(c, _):
            return checksummed(f + 1e-36 * c).sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    cfn = jax.jit(chained)
    float(np.asarray(cfn(frames)))  # compile + warm
    chain_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(cfn(frames)))
        chain_times.append(time.perf_counter() - t0)
    chain_med = float(np.median(chain_times))
    device_ms = chain_med / K * 1e3  # per-run device time, fetch amortized
    sustained_xrt = audio_seconds * K / chain_med

    xrt = audio_seconds / med
    baseline_xrt = 0.0929 / 0.01319776  # reference bench_pitch, ~7.04x RT
    result = {
        "metric": "pitch+formant+mfcc throughput",
        "value": round(xrt, 1),
        "unit": "audio-seconds/sec/chip (x real-time)",
        "vs_baseline": round(xrt / baseline_xrt, 1),
        "wall_ms": round(med * 1e3, 1),
        "device_ms": round(device_ms, 1),
        "sustained_xrt": round(sustained_xrt, 1),
        "tunnel_floor_ms": round(tunnel_floor_ms, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
