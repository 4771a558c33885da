"""The /stream/* HTTP endpoints: long-recording serving backed by
voxtpu.pipeline.StreamAnalyzer (the reference's incremental FormantExtractor
iterator idiom, /root/reference/src/spectrum.rs:336-369, over HTTP).

Pins the round-5 serving contract: HTTP-streamed features equal the one-shot
library analysis (exactly, except MFCC's documented f32-ulp batch-shape
class, PARITY deviation 5); a recording longer than max_body_bytes streams
fine; the end-of-stream Viterbi equals the whole-recording host DP; byte
tails and channel selection survive arbitrary append splits; and the serving
hygiene items (per-server LRU executable cache, fail-fast shutdown,
allowed_rates) hold.
"""

import http.client
import io
import json
import os
import threading
import time

import numpy as np
import jax.numpy as jnp
import pytest

from voxtpu.pipeline import analyze

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
WAV = os.path.join(FIX, "short_sample.wav")

SR = 8000.0


def _make_server(**kw):
    from voxtpu.serve import ServeConfig, VoxServer

    defaults = kw.pop("defaults", {"frame_ms": 16.0, "hop_ms": 8.0})
    srv = VoxServer(ServeConfig(
        host="127.0.0.1", port=0, window_ms=1.0, bucket=64,
        stream_chunk_frames=kw.pop("stream_chunk_frames", 8),
        defaults=defaults, **kw,
    ))
    host, port = srv.start()
    return srv, host, port


def _post(host, port, path, body=b"", timeout=600.0):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    conn.request("POST", path, body=body)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def _sine(seconds=1.0, f=220.0, sr=SR, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.5 * np.sin(2 * np.pi * f * t)
    if noise:
        x = x + noise * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def _stream(host, port, x, block, open_q, close_body=b""):
    """Drive a full open/append*/close session; returns (concat feats, close resp)."""
    st, d = _post(host, port, f"/stream/open?{open_q}")
    assert st == 200, d
    sid = json.loads(d)["session"]
    feats: dict = {}

    def take(resp):
        for k, v in resp["features"].items():
            feats.setdefault(k, []).extend(v)

    for i in range(0, len(x), block):
        st, d = _post(host, port, f"/stream/append?session={sid}",
                      x[i:i + block].tobytes())
        assert st == 200, d
        take(json.loads(d))
    st, d = _post(host, port, f"/stream/close?session={sid}", close_body)
    assert st == 200, d
    resp = json.loads(d)
    take(resp)
    return feats, resp


def _assert_feats_match_one_shot(feats, one, total_frames):
    assert total_frames == int(np.asarray(one["rms"]).shape[0])
    for k in ("f0", "f0_strength", "rms", "formant_freqs", "formant_bws",
              "status", "pitch_candidates_freq"):
        got = np.asarray(feats[k], dtype=np.float64)
        want = np.asarray(one[k], dtype=np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=0, err_msg=k)
    # MFCC: f32-ulp batch-shape class (PARITY deviation 5) — the chunked
    # program's matmul pass structure differs from the one-shot shape.
    np.testing.assert_allclose(
        np.asarray(feats["mfcc"], np.float64), np.asarray(one["mfcc"], np.float64),
        rtol=1e-5, atol=1e-5, err_msg="mfcc",
    )
    # hnr_db: -inf rides as JSON null.
    got = np.asarray([(np.nan if v is None else v) for row in feats["hnr_db"]
                      for v in np.atleast_1d(row)], dtype=np.float64)
    want = np.asarray(one["hnr_db"], dtype=np.float64).ravel()
    want = np.where(np.isfinite(want), want, np.nan)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=0, equal_nan=True)


def test_stream_http_equals_one_shot():
    """Multi-chunk HTTP stream == one-shot library analyze (1e-9 on every
    feature except MFCC's documented ulp class)."""
    srv, host, port = _make_server()
    try:
        x = _sine(1.0, noise=0.01)
        feats, resp = _stream(host, port, x, block=1700,
                              open_q="rate=8000&frame_ms=16&hop_ms=8")
        from voxtpu.cli import build_analysis_config

        cfg = build_analysis_config(SR, frame_ms=16.0, hop_ms=8.0)
        one = analyze(x, cfg)
        _assert_feats_match_one_shot(feats, one, resp["frames_done"])
        assert resp["closed"] is True
        # It actually streamed: multiple chunks, bounded buffering.
        snap = srv.stats.snapshot()
        assert snap["stream_chunks"] >= 3
        assert snap["stream_sessions"] == 1
    finally:
        srv.shutdown()


def test_stream_concurrent_sessions_are_isolated():
    """Two sessions streaming CONCURRENTLY over one server (same config ->
    same compiled chunk program) must each equal their own one-shot
    analysis: the device-resident (est_f, est_b) formant carry is
    per-session state, and interleaved chunk dispatches from two handler
    threads must never cross-pollinate it."""
    srv, host, port = _make_server()
    try:
        xs = [_sine(1.0, f=180.0, noise=0.01, seed=1),
              _sine(1.0, f=320.0, noise=0.01, seed=2)]
        out = [None, None]
        errs = []

        def go(i):
            try:
                out[i] = _stream(host, port, xs[i], block=1311,
                                 open_q="rate=8000&frame_ms=16&hop_ms=8")
            except Exception as e:  # surface assertion text, not a hang
                errs.append((i, repr(e)))

        ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs
        from voxtpu.cli import build_analysis_config

        cfg = build_analysis_config(SR, frame_ms=16.0, hop_ms=8.0)
        for i in range(2):
            feats, resp = out[i]
            one = analyze(xs[i], cfg)
            _assert_feats_match_one_shot(feats, one, resp["frames_done"])
        assert srv.stats.snapshot()["stream_sessions"] == 2
    finally:
        srv.shutdown()


def test_stream_http_viterbi_close_matches_whole_recording_dp():
    """viterbi=1 at open: close's full-length track == the host DP over the
    one-shot trimmed candidates (global intensity peak spans the stream)."""
    srv, host, port = _make_server()
    try:
        x = _sine(0.8, f=210.0, noise=0.002, seed=9)
        x[len(x) // 2:] *= 0.001  # quiet tail exercises the silence-aware score
        feats, resp = _stream(host, port, x, block=1311,
                              open_q="rate=8000&frame_ms=16&hop_ms=8&viterbi=1")
        assert "viterbi" in resp
        got_f0 = np.asarray(resp["viterbi"]["f0"], dtype=np.float64)
        assert got_f0.shape[0] == resp["frames_done"]

        from voxtpu.cli import build_analysis_config
        from voxtpu.frame import frame_signal
        from voxtpu.viterbi import PathConfig, pitch_path_host

        cfg = build_analysis_config(SR, frame_ms=16.0, hop_ms=8.0)
        frames = frame_signal(jnp.asarray(x), cfg.frame_len, cfg.hop)
        one = analyze(x, cfg)
        lp = np.max(np.abs(np.asarray(frames)), axis=-1)
        f0, s0 = pitch_path_host(
            np.asarray(one["pitch_candidates_freq"]),
            np.asarray(one["pitch_candidates_strength"]),
            np.asarray(one["pitch_candidates_valid"]),
            PathConfig(ceiling=cfg.pitch.fmax),
            local_intensity=lp / np.maximum(np.max(lp), 1e-30),
        )
        np.testing.assert_allclose(got_f0, f0, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(got_f0 > 0, f0 > 0)
    finally:
        srv.shutdown()


def test_stream_serves_recording_longer_than_max_body():
    """The functional hole /stream exists to close: a recording bigger than
    max_body_bytes cannot ride /analyze but streams fine in small appends."""
    srv, host, port = _make_server(max_body_bytes=40_000)
    try:
        x = _sine(4.0, noise=0.01, seed=2)  # 128 KB of f32 > 40 KB cap
        assert x.nbytes > 40_000
        # /analyze rejects the whole-body upload and names the fix.
        big = io.BytesIO()
        import wave
        with wave.open(big, "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(int(SR))
            w.writeframes((x * 32767).astype("<i2").tobytes())
        st, d = _post(host, port, "/analyze", big.getvalue())
        assert st == 400 and b"/stream/open" in d
        # The stream path serves it.
        feats, resp = _stream(host, port, x, block=9000,
                              open_q="rate=8000&frame_ms=16&hop_ms=8")
        from voxtpu.cli import build_analysis_config

        cfg = build_analysis_config(SR, frame_ms=16.0, hop_ms=8.0)
        one = analyze(x, cfg)
        _assert_feats_match_one_shot(feats, one, resp["frames_done"])
    finally:
        srv.shutdown()


def test_stream_s16le_stereo_channel_with_ragged_byte_splits():
    """s16le stereo appends split at NON-sample boundaries: the byte tail
    must reassemble exactly; channel=1 selects the right channel."""
    srv, host, port = _make_server()
    try:
        left = _sine(0.5, f=180.0, seed=3, noise=0.01)
        right = _sine(0.5, f=300.0, seed=4, noise=0.01)
        inter = np.empty(left.size * 2, dtype=np.float32)
        inter[0::2], inter[1::2] = left, right
        pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2").tobytes()

        st, d = _post(host, port, "/stream/open?rate=8000&frame_ms=16&hop_ms=8"
                                  "&encoding=s16le&channels=2&channel=1")
        assert st == 200, d
        sid = json.loads(d)["session"]
        feats: dict = {}
        rng = np.random.default_rng(7)
        i = 0
        while i < len(pcm):
            k = int(rng.integers(333, 2001))  # odd sizes: split mid-sample
            st, d = _post(host, port, f"/stream/append?session={sid}", pcm[i:i + k])
            assert st == 200, d
            for kk, v in json.loads(d)["features"].items():
                feats.setdefault(kk, []).extend(v)
            i += k
        st, d = _post(host, port, f"/stream/close?session={sid}")
        assert st == 200, d
        for kk, v in json.loads(d)["features"].items():
            feats.setdefault(kk, []).extend(v)

        from voxtpu.cli import build_analysis_config

        want_samples = ((np.clip(right, -1, 1) * 32767).astype("<i2")
                        .astype(np.float32) / 32767.0)
        cfg = build_analysis_config(SR, frame_ms=16.0, hop_ms=8.0)
        one = analyze(want_samples, cfg)
        got = np.asarray(feats["f0"], dtype=np.float64)
        np.testing.assert_allclose(got, np.asarray(one["f0"], np.float64),
                                   rtol=1e-9, atol=0)
    finally:
        srv.shutdown()


def test_stream_npz_format_roundtrip():
    srv, host, port = _make_server()
    try:
        x = _sine(0.6, noise=0.01)
        st, d = _post(host, port, "/stream/open?rate=8000&frame_ms=16&hop_ms=8")
        sid = json.loads(d)["session"]
        st, d = _post(host, port, f"/stream/append?session={sid}&format=npz",
                      x.tobytes())
        assert st == 200
        arrs = np.load(io.BytesIO(d))
        assert "f0" in arrs.files and arrs["f0"].ndim == 1
        st, d = _post(host, port, f"/stream/close?session={sid}&format=npz")
        assert st == 200
        tail = np.load(io.BytesIO(d))
        assert set(tail.files) >= {"f0", "rms"}
    finally:
        srv.shutdown()


def test_stream_session_errors_and_abort():
    srv, host, port = _make_server(allowed_rates=(8000.0,))
    try:
        # open validation
        for q, frag in [
            ("", b"requires rate"),
            ("rate=abc", b"bad value for rate"),
            ("rate=0", b"requires rate"),
            ("rate=8000&encoding=mp3", b"encoding"),
            ("rate=8000&channels=0", b"channels"),
            ("rate=8000&chunk_frames=4", b"chunk_frames"),
            ("rate=8000&channels=2&channel=5", b"out of range"),
            ("rate=44100", b"not served"),  # allowed_rates applies to streams
        ]:
            st, d = _post(host, port, f"/stream/open?{q}")
            assert st == 400 and frag in d, (q, st, d[:200])
        # unknown session
        st, d = _post(host, port, "/stream/append?session=nope", b"\0" * 8)
        assert st == 400 and b"unknown or expired" in d
        st, d = _post(host, port, "/stream/close?session=nope")
        assert st == 400
        # empty append
        st, d = _post(host, port, "/stream/open?rate=8000")
        sid = json.loads(d)["session"]
        st, d = _post(host, port, f"/stream/append?session={sid}")
        assert st == 400 and b"empty body" in d
        # abort drops the session; the id stops resolving
        st, d = _post(host, port, f"/stream/abort?session={sid}")
        assert st == 200 and json.loads(d)["aborted"] is True
        st, d = _post(host, port, f"/stream/append?session={sid}", b"\0" * 8)
        assert st == 400 and b"unknown or expired" in d
        # closing a closed (removed) session
        st, d = _post(host, port, "/stream/open?rate=8000")
        sid = json.loads(d)["session"]
        st, _ = _post(host, port, f"/stream/close?session={sid}")
        assert st == 200
        st, d = _post(host, port, f"/stream/close?session={sid}")
        assert st == 400 and b"unknown or expired" in d
        # daemon stayed healthy through all of it
        conn = http.client.HTTPConnection(host, port, timeout=60.0)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
        conn.close()
    finally:
        srv.shutdown()


def test_stream_locked_server_rejects_overrides_but_streams():
    srv, host, port = _make_server(allow_param_overrides=False)
    try:
        st, d = _post(host, port, "/stream/open?rate=8000&fmin=100")
        assert st == 400 and b"disabled" in d
        st, d = _post(host, port, "/stream/open?rate=8000&chunk_frames=16")
        assert st == 400 and b"chunk_frames overrides are disabled" in d
        # Host-side params stay available; the stream itself works.
        st, d = _post(host, port, "/stream/open?rate=8000&viterbi=1&channel=0")
        assert st == 200, d
        sid = json.loads(d)["session"]
        st, d = _post(host, port, f"/stream/close?session={sid}",
                      _sine(0.3).tobytes())
        assert st == 200 and "viterbi" in json.loads(d)
    finally:
        srv.shutdown()


def test_stream_idle_sessions_are_garbage_collected():
    srv, host, port = _make_server(stream_idle_timeout_s=0.05, max_streams=4)
    try:
        st, d = _post(host, port, "/stream/open?rate=8000")
        sid = json.loads(d)["session"]
        time.sleep(0.2)
        # GC runs lazily on the next open.
        st, _ = _post(host, port, "/stream/open?rate=8000")
        assert st == 200
        st, d = _post(host, port, f"/stream/append?session={sid}", b"\0" * 8)
        assert st == 400 and b"unknown or expired" in d
    finally:
        srv.shutdown()


def test_stream_max_sessions_503():
    srv, host, port = _make_server(max_streams=2)
    try:
        for _ in range(2):
            st, _ = _post(host, port, "/stream/open?rate=8000")
            assert st == 200
        st, d = _post(host, port, "/stream/open?rate=8000")
        assert st == 503 and b"too many open streams" in d
    finally:
        srv.shutdown()


# ---- serving hygiene (VERDICT r4 #7, ADVICE r4) ----------------------------


def test_serve_allowed_rates_rejects_wav_header_rate():
    srv, host, port = _make_server(allowed_rates=(16000.0,))
    try:
        with open(WAV, "rb") as f:
            body = f.read()
        st, d = _post(host, port, "/analyze", body)
        assert st == 400 and b"not served" in d and b"16000" in d
    finally:
        srv.shutdown()


def test_submit_after_stop_fails_fast():
    """A submit racing shutdown must error immediately, not block the full
    request_timeout_s (ADVICE r4: the drain race)."""
    from voxtpu.serve import ServeConfig, _MicroBatcher, _LRU, _Pending, _Stats

    cfg = ServeConfig(request_timeout_s=300.0)
    b = _MicroBatcher(cfg, _Stats(), _LRU())
    b.stop()
    item = _Pending(np.zeros((4, 8), np.float32), 4)
    t0 = time.monotonic()
    b.submit(("k", 4, 8), item)
    assert item.event.wait(5.0), "post-stop submit left its waiter hanging"
    assert item.error == "server shutting down"
    assert time.monotonic() - t0 < 2.0


def test_packed_cache_is_per_server_lru_and_cleared_on_shutdown():
    """Two servers must not share executables (cross-server config-default
    hazard); the LRU keeps hot keys under churn; shutdown() releases all."""
    from voxtpu.serve import _LRU

    a, b = _LRU(maxsize=3), _LRU(maxsize=3)
    a.put("k", 1)
    assert b.get("k") is None and a.get("k") == 1
    # LRU, not FIFO: touching the oldest key protects it from eviction.
    for k in ("x", "y"):
        a.put(k, k)
    assert a.get("k") == 1  # refresh
    a.put("z", "z")  # evicts "x" (the LRU), never the hot "k"
    assert a.get("k") == 1 and a.get("x") is None and a.get("y") == "y"
    a.clear()
    assert len(a) == 0

    srv, host, port = _make_server()
    try:
        x = _sine(0.3)
        feats, _ = _stream(host, port, x, block=len(x),
                           open_q="rate=8000&frame_ms=16&hop_ms=8")
        assert len(srv.cache) >= 1
    finally:
        srv.shutdown()
    assert len(srv.cache) == 0


def test_warmup_covers_all_allowed_rates():
    """A locked-rate server serves its first request warm for EVERY pinned
    rate: warmup() with no rate compiles each allowed_rates entry."""
    srv, _h, _p = _make_server(allowed_rates=(8000.0, 16000.0))
    try:
        srv.warmup(shapes=[(1, 64)])
        keys = list(srv.cache._d)
        # Production keys are ("padded", config, B, Fp, dp); stream keys
        # ("stream", config, ...). Pull the config element from each.
        rates = sorted({
            e.sample_rate for k in keys for e in k if hasattr(e, "sample_rate")
        })
        assert rates == [8000.0, 16000.0], keys
    finally:
        srv.shutdown()
