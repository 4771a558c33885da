"""End-to-end corpus throughput on the chip (VERDICT r4 #2).

The reference's deployment unit is the caller's file loop
(/root/reference/tests/lib.rs:71-83); voxtpu's corpus runner replaces it.
bench.py measures the device pipeline on ONE tiled recording; this measures
the whole many-file path — WAV decode, framing, bucket padding, device
dispatch, feature fetch, npz write — over a generated mixed-length corpus,
with a stage split, and A/Bs the two knobs the loop owns:

  reader:   pure-Python RIFF walker vs the native C++ loader
  dispatch: sync (fetch file i before dispatching i+1) vs double-buffered
            (dispatch i+1, THEN fetch i — device computes i+1 while the
            ~25 ms tunnel fetch of i drains)

Also times `python -m voxtpu corpus` itself once (the honest number a user
sees, interpreter + warm-cache compile checks included).

Run on the chip: python scripts/perf_corpus.py [n_files]
"""

import os
import shutil
import subprocess
import sys
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SR = 44100
LENGTHS_S = [0.5, 1.0, 2.0, 3.0, 5.0, 8.0]


def gen_corpus(dirpath: str, n_files: int) -> float:
    """Deterministic mixed-length 16-bit WAVs; returns total audio seconds."""
    from util import synth_vowel

    os.makedirs(dirpath, exist_ok=True)
    total = 0.0
    fmts = [
        [(730.0, 60.0), (1090.0, 80.0), (2440.0, 120.0)],
        [(270.0, 50.0), (2290.0, 90.0), (3010.0, 150.0)],
        [(390.0, 60.0), (1990.0, 90.0), (2550.0, 140.0)],
    ]
    for i in range(n_files):
        secs = LENGTHS_S[i % len(LENGTHS_S)]
        n = int(SR * secs)
        x = synth_vowel(SR, 110.0 + 7.0 * (i % 13), fmts[i % 3], n,
                        noise=0.01, seed=1000 + i)
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
        with wave.open(os.path.join(dirpath, f"f{i:04d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(pcm.tobytes())
        total += secs
    return total


def instrumented(paths, outdir, native_reader: bool, double_buffer: bool):
    """The corpus serial loop with per-stage timers. Returns dict of totals."""
    import jax
    import jax.numpy as jnp

    from voxtpu import native
    from voxtpu.cli import (
        _bucket, _bucket_target, _fetch, build_analysis_config, write_features,
    )
    from voxtpu.frame import frame_signal
    from voxtpu.io_wav import read_wav
    from voxtpu.pipeline import analyze_frames

    config = build_analysis_config(float(SR))
    bucket = 1024

    def read(path):
        if native_reader and native.available():
            samples, sr, _b, _c = native.read_wav(
                path, dtype=np.float32, channel=0, return_channels=True
            )
            return samples
        return read_wav(path, dtype=np.float32).samples

    # Warm every rung shape outside the timed loop (compiles are shape
    # discipline, not throughput — and the persistent cache carries them).
    rungs = sorted({
        _bucket_target(
            (int(SR * s) - config.frame_len) // config.hop + 1, bucket
        ) for s in LENGTHS_S
    })
    for r in rungs:
        out = analyze_frames(jnp.zeros((r, config.frame_len), jnp.float32), config)
        _fetch({k: v[:1] for k, v in out.items()})
    os.makedirs(outdir, exist_ok=True)

    t_read = t_disp = t_fetch = t_write = 0.0
    wall0 = time.perf_counter()
    pending = None  # (path, lazy-trimmed out dict)

    def drain(p):
        nonlocal t_fetch, t_write
        path, out = p
        t0 = time.perf_counter()
        host = _fetch(out)
        t_fetch += time.perf_counter() - t0
        t0 = time.perf_counter()
        write_features(
            os.path.join(outdir, os.path.splitext(os.path.basename(path))[0] + ".npz"),
            host,
        )
        t_write += time.perf_counter() - t0

    for path in paths:
        t0 = time.perf_counter()
        samples = read(path)
        frames = frame_signal(jnp.asarray(samples, jnp.float32),
                              config.frame_len, config.hop)
        fpad, F = _bucket(frames, bucket)
        t_read += time.perf_counter() - t0

        t0 = time.perf_counter()
        out = analyze_frames(fpad, config)
        out = {k: v[:F] for k, v in out.items()}  # in-graph-ish lazy trims
        t_disp += time.perf_counter() - t0

        if double_buffer:
            if pending is not None:
                drain(pending)
            pending = (path, out)
        else:
            drain((path, out))
    if pending is not None:
        drain(pending)
    wall = time.perf_counter() - wall0
    return {"read+frame": t_read, "dispatch": t_disp, "fetch": t_fetch,
            "write": t_write, "wall": wall}


def instrumented_batched(paths, outdir, batch_files: int):
    """The cli.py --batch-files loop with per-stage timers: host-stacked
    (B, S) blocks, ONE analyze_batch_padded dispatch + ONE fetch per block."""
    import jax.numpy as jnp  # noqa: F401  (device init)

    from voxtpu import native
    from voxtpu.cli import (
        _bucket_target, _bucket_target_fine, build_analysis_config,
        write_features,
    )
    from voxtpu.pipeline import (
        _analyze_batch_padded_packed, _unpack_frames, padded_manifest,
    )

    config = build_analysis_config(float(SR))
    bucket = 1024

    def read(path):
        if native.available():
            samples, _sr, _b, _c = native.read_wav(
                path, dtype=np.float32, channel=0, return_channels=True
            )
            return samples
        from voxtpu.io_wav import read_wav

        return read_wav(path, dtype=np.float32).samples

    # Warm the (B, rung) shapes outside the timed loop.
    rungs = sorted({
        _bucket_target_fine(
            (int(SR * s) - config.frame_len) // config.hop + 1, bucket
        ) for s in LENGTHS_S
    })
    for r in rungs:
        S = (r - 1) * config.hop + config.frame_len
        padded_manifest(config, batch_files, S, np.float32)  # warm eval_shape
        np.asarray(_analyze_batch_padded_packed(
            np.zeros((batch_files, S), np.float32),
            np.full((batch_files,), S, np.int32), config,
        ))
    os.makedirs(outdir, exist_ok=True)

    paths = sorted(paths, key=os.path.getsize)
    t_read = t_disp = t_fetch = t_write = 0.0
    wall0 = time.perf_counter()
    inflight = None

    def drain(pend):
        nonlocal t_fetch, t_write
        flat, man, group, Fs = pend
        t0 = time.perf_counter()
        host = _unpack_frames(np.asarray(flat), man)
        t_fetch += time.perf_counter() - t0
        t0 = time.perf_counter()
        for i, p in enumerate(group):
            write_features(
                os.path.join(outdir, os.path.splitext(os.path.basename(p))[0] + ".npz"),
                {k: v[i, : Fs[i]] for k, v in host.items()},
            )
        t_write += time.perf_counter() - t0

    for b0 in range(0, len(paths), batch_files):
        group = paths[b0 : b0 + batch_files]
        t0 = time.perf_counter()
        sams = [read(p) for p in group]
        Ftrue = max(
            (s.shape[0] - config.frame_len) // config.hop + 1 for s in sams
        )
        Fmax = _bucket_target_fine(Ftrue, bucket)
        S = (Fmax - 1) * config.hop + config.frame_len
        stacked = np.zeros((batch_files, S), np.float32)
        lengths = np.zeros((batch_files,), np.int32)
        Fs = []
        for i, s in enumerate(sams):
            m = min(s.shape[0], S)
            stacked[i, :m] = s[:m]
            lengths[i] = m
            Fs.append(max((s.shape[0] - config.frame_len) // config.hop + 1, 0))
        t_read += time.perf_counter() - t0

        t0 = time.perf_counter()
        flat = _analyze_batch_padded_packed(stacked, lengths, config)
        trim = min(Fmax, max(64, (Ftrue + 63) // 64 * 64))
        if trim < Fmax:
            flat = flat[:, :trim, :]  # rung-padding trim: async, pipelines
        t_disp += time.perf_counter() - t0

        pend = (flat, padded_manifest(config, batch_files, S, np.float32),
                group, Fs)
        if inflight is not None:
            drain(inflight)
        inflight = pend
    if inflight is not None:
        drain(inflight)
    wall = time.perf_counter() - wall0
    return {"read+frame": t_read, "dispatch": t_disp, "fetch": t_fetch,
            "write": t_write, "wall": wall}


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    corpus_dir = "/tmp/voxtpu_perf_corpus"
    if not os.path.isdir(corpus_dir) or len(os.listdir(corpus_dir)) < n_files:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        audio_s = gen_corpus(corpus_dir, n_files)
    else:
        audio_s = sum(LENGTHS_S[i % len(LENGTHS_S)] for i in range(n_files))
    paths = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        if f.endswith(".wav")
    )[:n_files]
    nbytes = sum(os.path.getsize(p) for p in paths)
    print(f"corpus: {len(paths)} files, {audio_s:.0f} s audio, "
          f"{nbytes / 1e6:.0f} MB", flush=True)

    for native_reader in (False, True):
        for double_buffer in (False, True):
            r = instrumented(paths, f"/tmp/voxtpu_perf_feats", native_reader,
                             double_buffer)
            xrt = audio_s / r["wall"]
            label = (("native" if native_reader else "python") + " reader, "
                     + ("double-buffered" if double_buffer else "sync      "))
            print(
                f"{label}: wall {r['wall']:6.2f} s = {xrt:7.0f}x real-time   "
                f"[read+frame {r['read+frame']:5.2f}  dispatch {r['dispatch']:5.2f}  "
                f"fetch {r['fetch']:5.2f}  write {r['write']:5.2f}]",
                flush=True,
            )

    for bf in (8, 16, 32):
        r = instrumented_batched(paths, "/tmp/voxtpu_perf_feats", bf)
        xrt = audio_s / r["wall"]
        print(
            f"batched --batch-files {bf:2d}: wall {r['wall']:6.2f} s = "
            f"{xrt:7.0f}x real-time   "
            f"[read+stack {r['read+frame']:5.2f}  dispatch {r['dispatch']:5.2f}  "
            f"fetch {r['fetch']:5.2f}  write {r['write']:5.2f}]",
            flush=True,
        )

    # The honest CLI number (fresh interpreter, warm on-disk compile cache),
    # batched (the default, --batch-files 8) vs per-file.
    for bf in ("16", "1"):
        outdir = "/tmp/voxtpu_perf_cli_feats"
        shutil.rmtree(outdir, ignore_errors=True)
        t0 = time.perf_counter()
        rc = subprocess.run(
            [sys.executable, "-m", "voxtpu", "corpus",
             os.path.join(corpus_dir, "*.wav"),
             "-o", outdir, "--no-resume", "--batch-files", bf],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=3600,
        )
        wall = time.perf_counter() - t0
        assert rc.returncode == 0, rc.stderr[-2000:]
        print(f"CLI end-to-end (fresh interpreter, --batch-files {bf}): "
              f"{wall:.1f} s = {audio_s / wall:.0f}x real-time", flush=True)


if __name__ == "__main__":
    main()
