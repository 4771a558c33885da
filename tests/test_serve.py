"""Serving daemon: analyze_batch per-file isolation + the HTTP/micro-batch
runtime (voxtpu/serve.py).

The reference has no serving story (its deployment model is the caller's
serial frame loop, /root/reference/tests/lib.rs:71-83); these tests pin the
framework's serving contract instead: responses equal the library's direct
`analyze`, concurrent requests coalesce into one device dispatch, and client
errors never take the daemon down.
"""

import http.client
import io
import json
import os
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze,
    analyze_batch,
    analyze_frames,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
WAV = os.path.join(FIX, "short_sample.wav")


def _tiny_cfg(viterbi=False):
    return AnalysisConfig(
        8000.0, 128, 64,
        PitchConfig(fmin=150.0, fmax=400.0, max_candidates=8, viterbi=viterbi),
        FormantConfig(n_coeffs=8),
        MfccConfig(num_coeffs=8, freq_hi=3500.0),
    )


def _tiny_frames(files=2, F=6, n=128, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    base = np.sin(2 * np.pi * 220.0 * t)
    return (base + 0.15 * rng.standard_normal((files, F, n))).astype(np.float32)


# ---------- analyze_batch: the files-axis batch entry ----------------------


def test_analyze_batch_matches_per_file():
    frames = _tiny_frames(files=3)
    cfg = _tiny_cfg()
    out = analyze_batch(jnp.asarray(frames), cfg)
    for b in range(frames.shape[0]):
        ref = analyze_frames(jnp.asarray(frames[b]), cfg)
        for k in ("f0", "formant_freqs", "formant_bws", "mfcc", "rms", "status"):
            np.testing.assert_allclose(
                np.asarray(out[k][b]), np.asarray(ref[k]), rtol=1e-6, atol=1e-6,
                err_msg=f"{k} file {b}",
            )


def test_analyze_batch_viterbi_per_file_isolation():
    """The Viterbi DP and its global intensity peak are per file: batching a
    loud file with a quiet one must not change either one's path."""
    frames = _tiny_frames(files=2)
    frames[1] *= 0.05  # quiet file: per-file peak normalization must hold
    cfg = _tiny_cfg(viterbi=True)
    out = analyze_batch(jnp.asarray(frames), cfg)
    for b in range(2):
        ref = analyze_frames(jnp.asarray(frames[b]), cfg)
        np.testing.assert_allclose(
            np.asarray(out["f0"][b]), np.asarray(ref["f0"]), rtol=1e-6, atol=1e-6,
        )


def test_analyze_batch_zero_padding_rows_are_safe():
    """All-zero padding rows (the micro-batcher's B pad) produce finite
    outputs and do not perturb the real rows."""
    frames = _tiny_frames(files=1)
    cfg = _tiny_cfg()
    alone = analyze_batch(jnp.asarray(frames), cfg)
    padded = analyze_batch(
        jnp.asarray(np.concatenate([frames, np.zeros_like(frames)])), cfg
    )
    for k in ("f0", "formant_freqs", "mfcc", "rms"):
        np.testing.assert_allclose(
            np.asarray(padded[k][0]), np.asarray(alone[k][0]), rtol=1e-6, atol=1e-6,
        )
        assert np.all(np.isfinite(np.asarray(padded["mfcc"][1]))) or k != "mfcc"


@pytest.mark.skipif(
    not os.environ.get("VOXTPU_SHARDED_SUBTEST"),
    reason="multi-device compile; runs in the child pytest "
    "(test_serve_dp_group_in_subprocess) — XLA's CPU multi-device compile "
    "path segfaults nondeterministically late in a long-lived process",
)
def test_packed_analyze_data_parallel_matches_single_device():
    """dp>1 shards the packed program over the ('files',) mesh via GSPMD;
    outputs must match the single-device program (8 virtual CPU devices)."""
    import jax

    from voxtpu.pipeline import _unpack_frames as _unpack

    from voxtpu.serve import _packed_analyze

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    cfg = _tiny_cfg(viterbi=True)  # include the scan-heavy per-file stages
    frames = _tiny_frames(files=4, F=6, n=128)
    fn1, m1 = _packed_analyze(cfg, 4, 6, 128, dp=1)
    fn4, m4 = _packed_analyze(cfg, 4, 6, 128, dp=4)
    assert m1 == m4
    import jax.numpy as jnp

    a = _unpack(np.asarray(fn1(jnp.asarray(frames))), m1)
    b = _unpack(np.asarray(fn4(jnp.asarray(frames))), m4)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5, err_msg=k)


@pytest.mark.skipif(
    not os.environ.get("VOXTPU_SHARDED_SUBTEST"),
    reason="multi-device compile; runs in the child pytest "
    "(test_serve_dp_group_in_subprocess)",
)
def test_packed_analyze_padded_data_parallel_matches_single_device():
    """The samples-transport production program (`_packed_analyze_padded`)
    under dp>1: GSPMD over ('files',) must match the single-device program,
    with lengths sharded alongside their rows."""
    import jax

    from voxtpu.pipeline import _unpack_frames as _unpack

    from voxtpu.serve import _packed_analyze_padded, _samples_for_frames

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    cfg = _tiny_cfg(viterbi=True)
    Fp = 6
    S = _samples_for_frames(cfg, Fp)
    rng = np.random.default_rng(3)
    t = np.arange(S) / 8000.0
    samples = (np.sin(2 * np.pi * 220.0 * t)[None, :]
               + 0.15 * rng.standard_normal((4, S))).astype(np.float32)
    lengths = np.array([S, S - cfg.hop, S, S - 2 * cfg.hop], np.int32)
    for i, L in enumerate(lengths):
        samples[i, L:] = 0.0
    fn1, m1 = _packed_analyze_padded(cfg, 4, Fp, dp=1)
    fn4, m4 = _packed_analyze_padded(cfg, 4, Fp, dp=4)
    assert m1 == m4
    import jax.numpy as jnp

    a = _unpack(np.asarray(fn1(jnp.asarray(samples), jnp.asarray(lengths))), m1)
    b = _unpack(np.asarray(fn4(jnp.asarray(samples), jnp.asarray(lengths))), m4)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-5, err_msg=k)


def test_packed_padded_transport_matches_frames_transport():
    """The r5 transport swap's direct pin: the samples-transport program
    (in-graph framing, `_packed_analyze_padded`) produces the same features
    as the frames-transport program it replaced (`_packed_analyze` on
    host-framed stacks) — framing is pure data movement."""
    import jax.numpy as jnp

    from voxtpu.pipeline import _unpack_frames as _unpack
    from voxtpu.serve import (
        _frame_host, _packed_analyze, _packed_analyze_padded,
        _samples_for_frames,
    )

    cfg = _tiny_cfg()
    Fp = 6
    S = _samples_for_frames(cfg, Fp)
    rng = np.random.default_rng(7)
    t = np.arange(S) / 8000.0
    base = np.sin(2 * np.pi * 220.0 * t)
    B = 2
    # File 0 fills the rung; file 1 is shorter (4 of 6 frames) — its padded
    # rows must match the host-zero-padded frames of the old transport.
    Ls = [S, _samples_for_frames(cfg, 4)]
    samples = np.zeros((B, S), np.float32)
    frames = np.zeros((B, Fp, cfg.frame_len), np.float32)
    for i, L in enumerate(Ls):
        x = (base[:L] + 0.1 * rng.standard_normal(L)).astype(np.float32)
        samples[i, :L] = x
        fh = _frame_host(x, cfg.frame_len, cfg.hop)
        frames[i, : fh.shape[0]] = fh
    fn_f, m_f = _packed_analyze(cfg, B, Fp, cfg.frame_len)
    fn_s, m_s = _packed_analyze_padded(cfg, B, Fp)
    assert m_f == m_s
    a = _unpack(np.asarray(fn_f(jnp.asarray(frames))), m_f)
    b = _unpack(np.asarray(fn_s(jnp.asarray(samples),
                                jnp.asarray(np.array(Ls, np.int32)))), m_s)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-6, err_msg=k)


def test_serve_dp_group_in_subprocess():
    """Run the multi-device serving tests in a fresh child pytest (the same
    isolation test_pipeline uses for its shard_map group)."""
    import subprocess
    import sys

    if os.environ.get("VOXTPU_SHARDED_SUBTEST"):
        pytest.skip("already in the sharded child")
    env = dict(os.environ, VOXTPU_SHARDED_SUBTEST="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", os.path.abspath(__file__),
         "-k", "data_parallel_matches"],
        env=env, capture_output=True, text=True, timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, f"dp child failed\n{r.stdout[-3000:]}\n{r.stderr[-1500:]}"
    assert "2 passed" in r.stdout, r.stdout[-2000:]


def test_serve_config_validation():
    from voxtpu.serve import ServeConfig, VoxServer

    with pytest.raises(ValueError, match="power of two"):
        VoxServer(ServeConfig(port=0, data_parallel=3))
    with pytest.raises(ValueError, match="max_batch"):
        VoxServer(ServeConfig(port=0, data_parallel=8, max_batch=4))


# ---------- the HTTP runtime ------------------------------------------------


@pytest.fixture(scope="module")
def server():
    from voxtpu.serve import ServeConfig, VoxServer

    srv = VoxServer(
        ServeConfig(
            host="127.0.0.1",
            port=0,
            window_ms=700.0,  # generous: the concurrency test must coalesce
            max_batch=4,
            bucket=64,
            request_timeout_s=600.0,
            defaults={"frame_ms": 50.0, "hop_ms": 10.0},
        )
    )
    host, port = srv.start()
    yield host, port, srv
    srv.shutdown()


def _post(host, port, body, query="", timeout=600.0):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    conn.request("POST", f"/analyze?{query}" if query else "/analyze", body=body)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def _get(host, port, path):
    conn = http.client.HTTPConnection(host, port, timeout=60.0)
    conn.request("GET", path)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, json.loads(data)


def test_serve_matches_direct_analyze(server):
    host, port, _srv = server
    with open(WAV, "rb") as f:
        body = f.read()
    status, data = _post(host, port, body)
    assert status == 200, data
    resp = json.loads(data)

    from voxtpu.io_wav import read_wav
    from voxtpu.cli import build_analysis_config

    wav = read_wav(WAV, dtype=np.float32)
    cfg = build_analysis_config(float(wav.sample_rate))
    direct = analyze(wav.samples, cfg)

    assert resp["frames"] == int(np.asarray(direct["rms"]).shape[0])
    assert resp["sample_rate"] == float(wav.sample_rate)
    for k in ("f0", "rms", "formant_freqs", "mfcc"):
        got = np.asarray(resp["features"][k], dtype=np.float64)
        want = np.asarray(direct[k], dtype=np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=k)


def test_serve_npz_roundtrip(server):
    host, port, _srv = server
    with open(WAV, "rb") as f:
        body = f.read()
    status, data = _post(host, port, body, query="format=npz")
    assert status == 200
    feats = np.load(io.BytesIO(data))
    status2, data2 = _post(host, port, body)  # same shape -> warm
    resp = json.loads(data2)
    np.testing.assert_allclose(
        feats["rms"], np.asarray(resp["features"]["rms"]), rtol=1e-6, atol=1e-7
    )
    assert set(feats.files) >= {"f0", "rms", "formant_freqs", "mfcc", "status"}


def test_serve_micro_batches_concurrent(server):
    """N concurrent requests coalesce into one fixed-shape dispatch and all
    get the single-request answer."""
    host, port, srv = server
    with open(WAV, "rb") as f:
        body = f.read()
    # Warm reference answer (its own dispatch).
    status, ref_data = _post(host, port, body)
    assert status == 200
    ref = json.loads(ref_data)["features"]

    before = srv.stats.snapshot()
    results = [None] * 3

    def go(i):
        results[i] = _post(host, port, body)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for status, data in results:
        assert status == 200
        feats = json.loads(data)["features"]
        np.testing.assert_allclose(
            np.asarray(feats["f0"]), np.asarray(ref["f0"]), rtol=1e-5, atol=1e-5
        )
    after = srv.stats.snapshot()
    new_batches = after["batches"] - before["batches"]
    new_reqs = after["batched_requests"] - before["batched_requests"]
    assert new_reqs == 3
    # Coalescing happened: fewer dispatches than requests.
    assert new_batches < 3, (before, after)
    assert any(int(k) >= 2 for k in after["batch_size_hist"])


def test_serve_viterbi_runs_on_trimmed_candidates(server):
    """viterbi=1 must equal the unpadded library path: the DP runs host-side
    on the TRIMMED candidates (pitch_path_host), never over bucket padding
    (the module server pads this fixture's 21 frames to the 64 rung, and a
    padded device DP would bias the tail toward unvoiced)."""
    host, port, _srv = server
    with open(WAV, "rb") as f:
        body = f.read()
    status, data = _post(host, port, body, query="viterbi=1")
    assert status == 200, data
    resp = json.loads(data)

    from voxtpu.cli import build_analysis_config
    from voxtpu.io_wav import read_wav
    from voxtpu.frame import frame_signal
    from voxtpu.viterbi import PathConfig, pitch_path_host

    wav = read_wav(WAV, dtype=np.float32)
    cfg = build_analysis_config(float(wav.sample_rate))
    frames = frame_signal(jnp.asarray(wav.samples), cfg.frame_len, cfg.hop)
    out = analyze_frames(frames, cfg)
    lp = np.max(np.abs(np.asarray(frames)), axis=-1)
    f0, s0 = pitch_path_host(
        np.asarray(out["pitch_candidates_freq"]),
        np.asarray(out["pitch_candidates_strength"]),
        np.asarray(out["pitch_candidates_valid"]),
        PathConfig(ceiling=cfg.pitch.fmax),
        local_intensity=lp / np.maximum(np.max(lp), 1e-30),
    )
    got = np.asarray(resp["features"]["f0"], dtype=np.float64)
    assert got.shape == f0.shape
    np.testing.assert_allclose(got, f0, rtol=1e-4, atol=1e-4)
    # Voicing decisions (the thing padding corrupts) must agree exactly.
    np.testing.assert_array_equal(got > 0, f0 > 0)


def test_serve_param_validation(server):
    host, port, _srv = server
    with open(WAV, "rb") as f:
        body = f.read()
    for q, frag in [
        ("hop_ms=0", b"must be > 0"),
        ("frame_ms=-5", b"must be > 0"),
        ("channel=-1", b"non-negative"),
        ("channel=abc", b"non-negative"),
        ("pitch_refine=bogus", b"pitch_refine"),
        ("format=xml", b"format"),
        ("fmin=700&fmax=600", b"fmin"),
        ("n_coeffs=0", b"n_coeffs"),
        ("refine_depth=0", b"refine_depth"),
    ]:
        status, data = _post(host, port, body, query=q)
        assert status == 400 and frag in data, (q, status, data[:200])


def test_serve_locked_param_overrides():
    from voxtpu.serve import ServeConfig, VoxServer

    srv = VoxServer(
        ServeConfig(port=0, allow_param_overrides=False, window_ms=1.0)
    )
    host, port = srv.start()
    try:
        # Config-affecting override -> 400 (checked before decode: no
        # compile is ever triggered by a locked-out request).
        status, data = _post(host, port, b"x", query="fmin=100")
        assert status == 400 and b"disabled" in data
        # Host-side params stay available (the decode failure proves the
        # param gate passed).
        status, data = _post(host, port, b"x", query="format=npz&viterbi=1")
        assert status == 400 and b"cannot decode" in data
    finally:
        srv.shutdown()


def test_serve_errors_do_not_kill_daemon(server):
    host, port, _srv = server
    status, data = _post(host, port, b"not a wav at all")
    assert status == 400 and b"cannot decode WAV" in data
    with open(WAV, "rb") as f:
        body = f.read()
    status, data = _post(host, port, body, query="bogus_param=1")
    assert status == 400 and b"unknown parameter" in data
    status, data = _post(host, port, body, query="channel=3")
    assert status == 400 and b"out of range" in data
    status, data = _post(host, port, b"")
    assert status == 400
    # Audio shorter than one frame: rejected up front (the samples-transport
    # dispatcher computes F from the sample count; F would be 0).
    import struct
    n_short = 8  # 8 samples << the 50 ms frame at 8 kHz
    short_wav = (
        b"RIFF" + struct.pack("<I", 36 + 2 * n_short) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 2 * n_short) + b"\x00" * (2 * n_short)
    )
    status, data = _post(host, port, short_wav)
    assert status == 400 and b"shorter than one frame" in data
    status, health = _get(host, port, "/healthz")
    assert status == 200 and health["status"] == "ok"
    conn = http.client.HTTPConnection(host, port, timeout=60.0)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    conn.close()


def test_serve_stats_shape(server):
    host, port, _srv = server
    status, stats = _get(host, port, "/stats")
    assert status == 200
    assert stats["requests"] >= 1
    assert stats["latency_ms"]["p50"] is not None
    assert stats["compiled_shapes"], stats
