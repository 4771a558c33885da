"""Serving-path latency/throughput on the real chip.

Embeds VoxServer in-process (HTTP over localhost), posts the bundled
two-vowels recording (2.83 s @ 44.1 kHz), and measures:

- cold first-request time (pipeline compile for the request's bucket shape),
- warm single-request latency (median of 9) — decode + frame + one (1,F,n)
  dispatch + JSON encode, end to end through HTTP,
- warm concurrent throughput: 8 simultaneous requests coalescing into one
  (8,F,n) micro-batch dispatch.

Run: PYTHONPATH=. python scripts/perf_serve.py
"""

import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from voxtpu.serve import ServeConfig, VoxServer

    srv = VoxServer(
        ServeConfig(host="127.0.0.1", port=0, window_ms=3.0, max_batch=8, bucket=1024)
    )
    host, port = srv.start()
    wav_path = os.path.join("tests", "fixtures", "sample-two_vowels.wav")
    with open(wav_path, "rb") as f:
        body = f.read()
    audio_s = 124928 / 44100.0

    def post(q=""):
        conn = http.client.HTTPConnection(host, port, timeout=1800)
        conn.request("POST", "/analyze" + (f"?{q}" if q else ""), body=body)
        r = conn.getresponse()
        data = r.read()
        conn.close()
        assert r.status == 200, data[:500]
        return data

    t0 = time.perf_counter()
    post()
    cold = time.perf_counter() - t0
    print(f"cold first request (incl. (1,F,n) compile): {cold:.1f} s", flush=True)

    for fmt, q in (("json", ""), ("npz", "format=npz")):
        lats = []
        for _ in range(9):
            t0 = time.perf_counter()
            post(q)
            lats.append(time.perf_counter() - t0)
        warm = float(np.median(lats)) * 1e3
        print(f"warm single-request latency ({fmt}): median {warm:.1f} ms "
              f"(p0 {min(lats)*1e3:.1f}, p100 {max(lats)*1e3:.1f}) "
              f"-> {audio_s/np.median(lats):.0f}x real-time single-stream",
              flush=True)

    print(json.dumps(srv.stats.snapshot(), indent=1), flush=True)
    srv.shutdown()

    # Concurrent throughput on a second server tuned for batching: a gather
    # window that reliably coalesces an 8-burst arriving over localhost HTTP
    # into ONE (8,F,n) dispatch.
    srv2 = VoxServer(
        ServeConfig(host="127.0.0.1", port=0, window_ms=30.0, max_batch=8,
                    bucket=1024)
    )
    host, port = srv2.start()

    def burst(n, q="format=npz"):
        errs = []

        def go():
            try:
                post(q)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=go) for _ in range(n)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        if errs:
            raise errs[0]
        return time.perf_counter() - t0

    t_cold8 = burst(8)
    print(f"cold 8-burst (incl. batch-shape compiles): {t_cold8:.1f} s", flush=True)
    walls = [burst(8) for _ in range(5)]
    med = float(np.median(walls))
    print(f"warm 8-concurrent burst (npz): median wall {med*1e3:.1f} ms -> "
          f"{8*audio_s/med:.0f}x real-time served", flush=True)

    # Steady-state pipelined stream: K clients each posting back-to-back for
    # N total requests — host work (decode/frame/encode) overlaps device
    # dispatches, batches form from queue pressure. The steadier serving
    # throughput number on a 1-core front end than a one-shot burst.
    def stream(clients, total):
        counter = [0]
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    if counter[0] >= total:
                        return
                    counter[0] += 1
                post("format=npz")

        ts = [threading.Thread(target=worker) for _ in range(clients)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return time.perf_counter() - t0

    stream(4, 8)  # warm any remaining batch shapes
    wall = stream(4, 32)
    print(f"pipelined stream, 4 clients x 32 reqs (npz): {wall:.2f} s -> "
          f"{32/wall:.1f} req/s, {32*audio_s/wall:.0f}x real-time served",
          flush=True)
    print(json.dumps(srv2.stats.snapshot(), indent=1), flush=True)
    srv2.shutdown()

    stream_session()
    saturation_sweep()


def stream_session():
    """Streaming-session latency on the chip: open one /stream session at
    44.1 kHz, append the two-vowels recording as raw f32le PCM in ~1 s
    bodies, time each append (appends that complete a 512-frame chunk run
    one warm device dispatch; the rest are host-only buffering)."""
    import http.client

    from voxtpu.io_wav import read_wav
    from voxtpu.serve import ServeConfig, VoxServer

    srv = VoxServer(ServeConfig(host="127.0.0.1", port=0, bucket=1024))
    host, port = srv.start()

    def post(path, body=b""):
        conn = http.client.HTTPConnection(host, port, timeout=1800)
        conn.request("POST", path, body=body)
        r = conn.getresponse()
        data = r.read()
        conn.close()
        assert r.status == 200, data[:400]
        return json.loads(data)

    wav = read_wav(os.path.join("tests", "fixtures", "sample-two_vowels.wav"),
                   dtype=np.float32)
    pcm = np.ascontiguousarray(wav.samples, np.float32).tobytes()
    block = 44100 * 4  # ~1 s of f32le per append

    for label in ("cold", "warm"):
        sid = post("/stream/open?rate=44100&encoding=f32le")["session"]
        t_appends, t0_all = [], time.perf_counter()
        for off in range(0, len(pcm), block):
            t0 = time.perf_counter()
            post(f"/stream/append?session={sid}", pcm[off : off + block])
            t_appends.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        post(f"/stream/close?session={sid}")
        t_close = time.perf_counter() - t0
        wall = time.perf_counter() - t0_all
        audio_s = wav.samples.shape[0] / 44100.0
        print(
            f"stream session ({label}): {len(t_appends)} appends of ~1 s, "
            f"wall {wall*1e3:.0f} ms (+close {t_close*1e3:.0f} ms) -> "
            f"{audio_s/wall:.0f}x real-time; append p50 "
            f"{sorted(t_appends)[len(t_appends)//2]*1e3:.1f} ms, "
            f"max {max(t_appends)*1e3:.1f} ms",
            flush=True,
        )
    # Concurrent sessions: N live streams interleaving warm chunk dispatches
    # on one server (per-session device-resident carry; thread-safety +
    # isolation pinned in test_stream_concurrent_sessions_are_isolated).
    import threading

    audio_s = wav.samples.shape[0] / 44100.0
    for nsess in (2, 4, 8):
        def run_one():
            sid = post("/stream/open?rate=44100&encoding=f32le")["session"]
            for off in range(0, len(pcm), block):
                post(f"/stream/append?session={sid}", pcm[off : off + block])
            post(f"/stream/close?session={sid}")

        t0 = time.perf_counter()
        ts = [threading.Thread(target=run_one) for _ in range(nsess)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        print(
            f"stream sessions x{nsess} (warm, concurrent): wall "
            f"{wall*1e3:.0f} ms -> {nsess*audio_s/wall:.0f}x real-time "
            f"aggregate",
            flush=True,
        )
    print(json.dumps(srv.stats.snapshot(), indent=1), flush=True)
    srv.shutdown()


def saturation_sweep():
    """VERDICT r4 #3: concurrency {1,2,4,8,16} x clip {0.26 s, 2.8 s},
    reporting QPS, p50/p95 request latency, aggregate x-real-time, and the
    batch-lane occupancy — for dispatcher pipeline_depth 0 (strictly
    synchronous: fetch batch k before dispatching k+1) vs 1 (double-buffered:
    batch k's tunnel fetch + host unpack overlap batch k+1's device compute).

    "lane busy" = stats.device_time_s / wall, where device_time_s is each
    batch's dispatch->fetch-complete wall. Through the axon tunnel that is
    dominated by the ~26 ms round-trip, not device compute (~1-2 ms/batch at
    these clip sizes) — read it as occupancy of the serialized dispatch lane,
    the resource double-buffering overlaps.
    """
    import http.client

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from voxtpu.serve import ServeConfig, VoxServer

    clips = []
    for name in ("short_sample.wav", "sample-two_vowels.wav"):
        p = os.path.join("tests", "fixtures", name)
        with open(p, "rb") as f:
            body = f.read()
        from voxtpu.io_wav import read_wav_bytes

        w = read_wav_bytes(body)
        clips.append((name, body, w.samples.shape[0] / w.sample_rate))

    for depth in (0, 1):
        srv = VoxServer(ServeConfig(
            host="127.0.0.1", port=0, window_ms=3.0, max_batch=16, bucket=1024,
            pipeline_depth=depth,
        ))
        host, port = srv.start()

        def post(body):
            conn = http.client.HTTPConnection(host, port, timeout=1800)
            conn.request("POST", "/analyze?format=npz", body=body)
            r = conn.getresponse()
            data = r.read()
            conn.close()
            assert r.status == 200, data[:300]

        print(f"\n-- pipeline_depth={depth} "
              f"({'double-buffered' if depth else 'synchronous'})", flush=True)
        for name, body, audio_s in clips:
            post(body)  # warm this clip's (1, F, n) shape
            # Warm every pow2 batch shape a timed row can coalesce into
            # (compiles are shape discipline, not serving throughput — an
            # unwarmed row reads the ~40 s cache replay, not the server).
            for nwarm in (16, 8, 4, 2, 16):
                ts = [threading.Thread(target=post, args=(body,))
                      for _ in range(nwarm)]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
            for clients in (1, 2, 4, 8, 16):
                total = max(24, clients * 6)
                before = srv.stats.snapshot()
                counter = [0]
                lock = threading.Lock()
                lats = []

                def worker():
                    while True:
                        with lock:
                            if counter[0] >= total:
                                return
                            counter[0] += 1
                        t0 = time.perf_counter()
                        post(body)
                        dt = time.perf_counter() - t0
                        with lock:
                            lats.append(dt)

                ts = [threading.Thread(target=worker) for _ in range(clients)]
                t0 = time.perf_counter()
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
                wall = time.perf_counter() - t0
                after = srv.stats.snapshot()
                dev = after["device_time_s"] - before["device_time_s"]
                lats.sort()
                p50 = lats[len(lats) // 2] * 1e3
                p95 = lats[int(0.95 * (len(lats) - 1))] * 1e3
                print(
                    f"{name[:12]:12s} ({audio_s:4.2f}s) c={clients:2d}: "
                    f"{total / wall:6.1f} req/s  p50 {p50:6.1f} ms  "
                    f"p95 {p95:6.1f} ms  {total * audio_s / wall:7.0f}x rt  "
                    f"lane busy {min(1.0, dev / wall) * 100:3.0f}%",
                    flush=True,
                )
        srv.shutdown()


if __name__ == "__main__":
    main()
