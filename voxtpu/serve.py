"""`voxtpu serve` — a warm-pipeline HTTP daemon with micro-batching.

The reference's deployment story is "the caller writes a frame loop"
(/root/reference/tests/lib.rs:71-83; SURVEY C28: no threads, no servers).
voxtpu targets production serving, so the framework ships the runtime piece
that loop becomes at scale:

- **Warm executables.** The full pipeline compiles in minutes on TPU
  (remote AOT); the daemon compiles once per (config, shape) and holds the
  executables for the life of the process (plus the on-disk compile cache).
- **O(1) compiled shapes.** Request audio of any length lands on the bucket
  ladder (`cli._bucket_target`): the frame axis pads to {64, 256, k*bucket},
  the batch axis to powers of two up to `max_batch` — so arbitrary traffic
  never triggers unbounded recompilation.
- **Micro-batching.** Concurrent requests with the same (config, padded-F)
  key gather for `window_ms` and run as ONE fixed-shape
  `(B, F, n)` device dispatch (`voxtpu.pipeline.analyze_batch`, exact
  per-file isolation) — the MXU sees batches, not single files, and the
  per-dispatch latency (~25 ms through the axon tunnel; microseconds on
  local PJRT) amortizes across requests.

Endpoints:
  POST /analyze?<params>   WAV bytes in -> JSON (default) or npz features
  GET  /healthz            liveness + backend/device inventory
  GET  /stats              request/batch/latency counters

Request params (all optional; defaults come from the server's CLI flags):
  frame_ms, hop_ms, fmin, fmax, threshold, n_coeffs, mfcc_coeffs,
  features=pitch,formants,mfcc,rms, pitch_refine=sinc|parabolic,
  refine_depth=N, viterbi=0|1, channel=N|mix, format=json|npz

The module is stdlib-only (http.server + threading); jax is imported lazily
so importing `voxtpu.serve` never initializes a backend.
"""

from __future__ import annotations

import io
import json
import threading
import time
import traceback
import queue
import urllib.parse
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["ServeConfig", "VoxServer"]


@dataclass(frozen=True)
class ServeConfig:
    host: str = "127.0.0.1"
    port: int = 8080
    #: micro-batch gather window after the first request of a batch arrives
    window_ms: float = 3.0
    #: max files per device dispatch (batch axis pads to powers of two <= this)
    max_batch: int = 8
    #: frame bucket (0 disables padding — every length compiles fresh)
    bucket: int = 1024
    #: devices on the "files" mesh axis (power of two). Each device runs the
    #: complete per-file pipeline on its shard of the batch — recordings are
    #: independent, so serving data-parallelism needs NO collectives beyond
    #: the input scatter / packed-output gather (SURVEY C28: the files axis).
    data_parallel: int = 1
    max_body_bytes: int = 256 << 20
    #: how long a request may wait on the device queue (covers cold compiles)
    request_timeout_s: float = 900.0
    #: when False, requests may not override analysis params (each distinct
    #: config is a multi-minute cold compile serialized on the dispatcher —
    #: an easy DoS from untrusted clients). Host-side params (channel,
    #: format, viterbi) stay available. NOTE: the WAV header's sample rate is
    #: ALSO part of the compiled-program key (frame_len derives from it), so a
    #: locked-down deployment should set `allowed_rates` too — otherwise a
    #: client cycling fake header rates still forces unbounded compiles.
    allow_param_overrides: bool = True
    #: sample rates (Hz) accepted from request WAV headers; empty = any. Each
    #: distinct rate is its own compiled program — pin this for untrusted
    #: clients (see allow_param_overrides).
    allowed_rates: tuple = ()
    #: analysis defaults applied to requests that don't override them
    defaults: dict = field(default_factory=dict)


_ALLOWED_PARAMS = {
    "frame_ms", "hop_ms", "fmin", "fmax", "threshold", "n_coeffs",
    "mfcc_coeffs", "features", "pitch_refine", "refine_depth", "viterbi",
    "channel", "format",
}
_FLOAT_PARAMS = {"frame_ms", "hop_ms", "fmin", "fmax", "threshold"}
_INT_PARAMS = {"n_coeffs", "mfcc_coeffs", "refine_depth"}


class RequestError(ValueError):
    """Client error -> HTTP 400."""


class _Pending:
    __slots__ = ("frames", "F", "event", "result", "error", "t_enqueue")

    def __init__(self, frames: np.ndarray, F: int):
        self.frames = frames  # (Fp, n) float32, zero-padded past F
        self.F = F
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t_enqueue = time.monotonic()


_STOP = object()


def _pow2_batch(b: int, max_batch: int) -> int:
    p = 1
    while p < b:
        p *= 2
    return min(p, max_batch)


#: Compiled-program cache, FIFO-bounded: every entry is a full XLA
#: executable (minutes of TPU compile each), and the key includes the
#: request config — without a bound, a client varying an analysis param per
#: request would grow it monotonically. 64 programs is far above any sane
#: deployment's working set; see ServeConfig.allow_param_overrides for
#: stopping the compile COST itself.
_PACKED_CACHE: dict = {}
_PACKED_CACHE_MAX = 64


def _packed_analyze(config, B: int, Fp: int, n: int, dp: int = 1):
    """One compiled program per (config, B, Fp, n, dp) that runs
    `analyze_batch` AND flattens every feature into a single (B, total)
    float32 buffer.

    Through the axon tunnel each fetched buffer pays a fixed per-buffer
    roundtrip (~25 ms; the ~12-feature dict costs ~300 ms fetched naively —
    the same lesson PERFORMANCE.md records for the CLI's in-graph feature
    concatenate), and local PJRT still prefers one contiguous D2H copy. The
    manifest of (key, shape, dtype) computed at trace time drives host-side
    unpacking; int/bool features round-trip exactly (status bits < 2^24).

    dp > 1 shards the batch over a ("files",) device mesh via sharding
    annotations (GSPMD): recordings are independent, so each device runs the
    complete per-file pipeline on its B/dp rows and the only cross-device
    traffic is the input scatter and the packed-output gather.
    """
    key = (config, B, Fp, n, dp)
    hit = _PACKED_CACHE.get(key)
    if hit is not None:
        return hit
    import jax
    import jax.numpy as jnp

    from voxtpu.pipeline import analyze_batch

    spec = jax.eval_shape(
        analyze_batch, jax.ShapeDtypeStruct((B, Fp, n), jnp.float32), config
    )
    manifest = [(k, tuple(v.shape), np.dtype(v.dtype)) for k, v in sorted(spec.items())]

    def packed(frames):
        out = analyze_batch(frames, config)
        return jnp.concatenate(
            [out[k].reshape(B, -1).astype(jnp.float32) for k, _s, _d in manifest],
            axis=1,
        )

    if dp > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if B % dp:
            raise ValueError(f"batch {B} not divisible by data_parallel {dp}")
        devices = jax.devices()
        if dp > len(devices):
            raise ValueError(f"data_parallel {dp} > {len(devices)} devices")
        mesh = Mesh(np.asarray(devices[:dp]), ("files",))
        fn = jax.jit(
            packed,
            in_shardings=NamedSharding(mesh, P("files", None, None)),
            out_shardings=NamedSharding(mesh, P("files", None)),
        )
    else:
        fn = jax.jit(packed)

    if len(_PACKED_CACHE) >= _PACKED_CACHE_MAX:
        _PACKED_CACHE.pop(next(iter(_PACKED_CACHE)))
    _PACKED_CACHE[key] = (fn, manifest)
    return fn, manifest


def _unpack(flat: np.ndarray, manifest) -> dict:
    out = {}
    col = 0
    B = flat.shape[0]
    for k, shape, dtype in manifest:
        w = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
        v = flat[:, col : col + w].reshape((B,) + shape[1:])
        col += w
        if dtype == np.bool_:
            v = v != 0
        elif np.issubdtype(dtype, np.integer):
            v = np.rint(v).astype(dtype)
        out[k] = v
    return out


class _MicroBatcher:
    """Single dispatcher thread owning all device work: drains the request
    queue, groups same-(config, F) items inside the gather window, and runs
    each group as one fixed-shape `analyze_batch` dispatch."""

    def __init__(self, cfg: ServeConfig, stats: "_Stats"):
        self.cfg = cfg
        self.stats = stats
        self.q: queue.Queue = queue.Queue()
        self.thread = threading.Thread(target=self._loop, daemon=True, name="voxtpu-batcher")
        self.thread.start()

    def submit(self, key, item: _Pending) -> None:
        self.q.put((key, item))

    def stop(self) -> None:
        self.q.put(_STOP)
        self.thread.join(timeout=10.0)
        # Whatever still sits in the queue (including items enqueued behind
        # the sentinel by in-flight handler threads) must error out NOW —
        # otherwise each waiter blocks the full request_timeout_s (minutes).
        self._drain_shutdown()

    def _drain_shutdown(self) -> None:
        while True:
            try:
                nxt = self.q.get_nowait()
            except queue.Empty:
                return
            if nxt is _STOP:
                continue
            _k, it = nxt
            it.error = "server shutting down"
            it.event.set()

    def _loop(self) -> None:
        while True:
            head = self.q.get()
            if head is _STOP:
                self._drain_shutdown()
                return
            groups: dict = {}
            key, item = head
            groups[key] = [item]
            deadline = time.monotonic() + self.cfg.window_ms / 1e3
            stop = False
            while True:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stop = True
                    break
                k, it = nxt
                groups.setdefault(k, []).append(it)
                if all(len(v) >= self.cfg.max_batch for v in groups.values()):
                    break
            for k, items in groups.items():
                for i in range(0, len(items), self.cfg.max_batch):
                    self._run(k, items[i : i + self.cfg.max_batch])
            if stop:
                return

    def _run(self, key, items: list) -> None:
        config, Fp, n = key
        try:
            import jax.numpy as jnp

            B = _pow2_batch(len(items), self.cfg.max_batch)
            # Small batches stay on one device (a dp-wide dispatch would pad
            # a single request to dp files); full-enough batches shard over
            # the files mesh axis.
            dp = self.cfg.data_parallel
            eff_dp = dp if dp > 1 and B >= dp else 1
            stack = np.zeros((B, Fp, n), dtype=np.float32)
            for i, it in enumerate(items):
                stack[i] = it.frames
            packed_fn, manifest = _packed_analyze(config, B, Fp, n, dp=eff_dp)
            t0 = time.monotonic()
            flat = np.asarray(packed_fn(jnp.asarray(stack)))
            dt = time.monotonic() - t0
            self.stats.record_batch(len(items), B, dt, key)
            out = _unpack(flat, manifest)
            for i, it in enumerate(items):
                it.result = {k: v[i, : it.F] for k, v in out.items()}
                it.event.set()
        except Exception:  # surface device/compile failures to every waiter
            err = traceback.format_exc()
            for it in items:
                it.error = err
                it.event.set()


class _Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.batches = 0
        self.batched_requests = 0
        self.batch_size_hist: dict = {}
        self.shapes: set = set()
        self.latencies: list = []  # rolling, seconds (end-to-end per request)
        self.device_s = 0.0
        self.started = time.time()

    def record_request(self, latency_s: float, ok: bool) -> None:
        with self.lock:
            self.requests += 1
            if not ok:
                self.errors += 1
            self.latencies.append(latency_s)
            if len(self.latencies) > 1000:
                self.latencies = self.latencies[-1000:]

    def record_batch(self, n_items: int, B: int, device_s: float, key) -> None:
        config, Fp, n = key
        with self.lock:
            self.batches += 1
            self.batched_requests += n_items
            self.batch_size_hist[n_items] = self.batch_size_hist.get(n_items, 0) + 1
            self.shapes.add((B, Fp, n))
            self.device_s += device_s

    def snapshot(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies)

            def pct(p):
                return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 2) if lat else None

            return {
                "uptime_s": round(time.time() - self.started, 1),
                "requests": self.requests,
                "errors": self.errors,
                "batches": self.batches,
                "batched_requests": self.batched_requests,
                "batch_size_hist": {str(k): v for k, v in sorted(self.batch_size_hist.items())},
                "compiled_shapes": sorted(list(self.shapes)),
                "latency_ms": {"p50": pct(0.50), "p95": pct(0.95), "max": pct(1.0)},
                "device_time_s": round(self.device_s, 3),
            }


def _frame_host(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """Host-side framing, identical to voxtpu.frame.frame_signal's strided
    semantics: F = (n - frame_len)//hop + 1 windows at stride hop."""
    if x.shape[0] < frame_len:
        raise RequestError(
            f"audio shorter than one frame ({x.shape[0]} < {frame_len} samples)"
        )
    win = np.lib.stride_tricks.sliding_window_view(x, frame_len)[::hop]
    return np.ascontiguousarray(win, dtype=np.float32)


def _select_channel(samples: np.ndarray, channel: str):
    """Mirror cli._read's channel semantics on decoded samples; returns
    (mono_samples, note_or_None)."""
    mix = str(channel).strip().lower() == "mix"
    if not mix:
        try:
            idx = int(channel)
        except ValueError:
            raise RequestError(f"bad channel: {channel!r}")
        if idx < 0:
            # A negative index would silently select from the END via numpy
            # semantics — and the native reader rejects it, so the two paths
            # would diverge.
            raise RequestError(f"channel must be non-negative, got {idx}")
    if samples.ndim == 1:
        if not mix and idx > 0:
            raise RequestError(f"channel {channel} out of range: input has 1 channel")
        return samples, None
    n_ch = samples.shape[1]
    if mix:
        return samples.mean(axis=1, dtype=samples.dtype), f"{n_ch}-channel input, mixed down"
    if idx >= n_ch:
        raise RequestError(f"channel {idx} out of range: input has {n_ch} channel(s)")
    return samples[:, idx], f"{n_ch}-channel input, using channel {idx}"


def _jsonable(v: np.ndarray):
    """Strict-JSON feature encoding: bools as 0/1, non-finite floats as null
    (hnr_db is -inf on unvoiced frames; `format=npz` keeps them exact)."""
    if v.dtype == bool:
        return v.astype(np.uint8).tolist()
    if np.issubdtype(v.dtype, np.floating) and not np.isfinite(v).all():
        obj = v.astype(object)
        obj[~np.isfinite(v)] = None
        return obj.tolist()
    return v.tolist()


class VoxServer:
    """The serving runtime: HTTP front end + micro-batching dispatcher.

    Use `start()`/`shutdown()` for embedding (tests), `serve_forever()` from
    the CLI."""

    def __init__(self, cfg: ServeConfig):
        dp = cfg.data_parallel
        if dp < 1 or (dp & (dp - 1)):
            raise ValueError(f"data_parallel must be a power of two, got {dp}")
        if cfg.max_batch < dp or cfg.max_batch % dp:
            # B = min(next_pow2, max_batch) must stay divisible by dp when a
            # group fills past max_batch, so max_batch itself must be a dp
            # multiple (a non-multiple would fail whole dispatches with 500s).
            raise ValueError(
                f"max_batch ({cfg.max_batch}) must be a multiple of "
                f"data_parallel ({dp})"
            )
        self.cfg = cfg
        self.stats = _Stats()
        self.batcher = _MicroBatcher(cfg, self.stats)
        server = self

        class Handler(BaseHTTPRequestHandler):
            # Serving logs go through the stats endpoint, not stderr spam.
            def log_message(self, fmt, *args):  # noqa: D102
                pass

            def do_GET(self):  # noqa: N802
                path = urllib.parse.urlparse(self.path).path
                if path == "/healthz":
                    self._json(200, server.health())
                elif path == "/stats":
                    self._json(200, server.stats.snapshot())
                else:
                    self._json(404, {"error": f"unknown path {path}"})

            def do_POST(self):  # noqa: N802
                t0 = time.monotonic()
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path != "/analyze":
                    self._json(404, {"error": f"unknown path {parsed.path}"})
                    return
                ok = False
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length <= 0:
                        raise RequestError("empty body (expected WAV bytes)")
                    if length > server.cfg.max_body_bytes:
                        raise RequestError(
                            f"body too large ({length} > {server.cfg.max_body_bytes})"
                        )
                    body = self.rfile.read(length)
                    fmt, payload = server.analyze_request(body, parsed.query)
                    if fmt == "npz":
                        self._bytes(200, payload, "application/octet-stream")
                    else:
                        self._json(200, payload)
                    ok = True
                except RequestError as e:
                    self._json(400, {"error": str(e)})
                except TimeoutError as e:
                    self._json(503, {"error": str(e)})
                except Exception:
                    self._json(500, {"error": traceback.format_exc(limit=20)})
                finally:
                    server.stats.record_request(time.monotonic() - t0, ok)

            def _json(self, code, obj):
                data = json.dumps(obj).encode()
                self._bytes(code, data, "application/json")

            def _bytes(self, code, data, ctype):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        self.httpd = ThreadingHTTPServer((cfg.host, cfg.port), Handler)
        self.httpd.daemon_threads = True

    # ---- request pipeline -------------------------------------------------

    def _params(self, query: str) -> dict:
        raw = urllib.parse.parse_qs(query, keep_blank_values=True)
        unknown = set(raw) - _ALLOWED_PARAMS
        if unknown:
            raise RequestError(
                f"unknown parameter(s): {sorted(unknown)}; allowed: {sorted(_ALLOWED_PARAMS)}"
            )
        if not self.cfg.allow_param_overrides:
            locked = set(raw) - {"channel", "format", "viterbi"}
            if locked:
                raise RequestError(
                    f"analysis parameter overrides are disabled on this "
                    f"server (got {sorted(locked)}); only channel/format/"
                    f"viterbi are accepted"
                )
        p = dict(self.cfg.defaults)
        for k, vs in raw.items():
            v = vs[-1]
            try:
                if k in _FLOAT_PARAMS:
                    p[k] = float(v)
                elif k in _INT_PARAMS:
                    p[k] = int(v)
                elif k == "viterbi":
                    p[k] = v.lower() in ("1", "true", "yes", "on")
                else:
                    p[k] = v
            except ValueError:
                raise RequestError(f"bad value for {k}: {v!r}")
        # Semantic validation: every client-controlled value that would
        # otherwise blow up deep inside framing/config as a 500.
        if p.get("frame_ms", 50.0) <= 0 or p.get("hop_ms", 10.0) <= 0:
            raise RequestError("frame_ms and hop_ms must be > 0")
        if p.get("fmin", 60.0) <= 0 or p.get("fmax", 600.0) <= p.get("fmin", 60.0):
            raise RequestError("need 0 < fmin < fmax")
        if p.get("n_coeffs", 13) < 1 or p.get("mfcc_coeffs", 13) < 1:
            raise RequestError("n_coeffs and mfcc_coeffs must be >= 1")
        if p.get("refine_depth") is not None and p["refine_depth"] < 1:
            raise RequestError("refine_depth must be >= 1")
        if p.get("pitch_refine", "sinc") not in ("sinc", "parabolic"):
            raise RequestError("pitch_refine must be 'sinc' or 'parabolic'")
        ch = str(p.get("channel", "0")).strip().lower()
        if ch != "mix" and not ch.isdigit():
            raise RequestError("channel must be a non-negative integer or 'mix'")
        if p.get("format", "json") not in ("json", "npz"):
            raise RequestError("format must be 'json' or 'npz'")
        return p

    def _config(self, sample_rate: float, p: dict):
        """The compiled-program config for a request. Viterbi is deliberately
        NOT part of it: the whole-recording DP runs host-side per request on
        the TRIMMED candidates (`viterbi.pitch_path_host`) — running it in
        the padded batch program is wrong (the backtrace would start in the
        zero-padded tail and bias the last real frames toward unvoiced), and
        viterbi/non-viterbi requests get to share executables."""
        from voxtpu.cli import build_analysis_config

        if self.cfg.allowed_rates and sample_rate not in self.cfg.allowed_rates:
            raise RequestError(
                f"sample rate {sample_rate:g} Hz not served; allowed: "
                f"{sorted(self.cfg.allowed_rates)}"
            )
        try:
            return build_analysis_config(
                sample_rate,
                frame_ms=p.get("frame_ms", 50.0),
                hop_ms=p.get("hop_ms", 10.0),
                features=p.get("features", "pitch,formants,mfcc,rms"),
                fmin=p.get("fmin", 60.0),
                fmax=p.get("fmax", 600.0),
                threshold=p.get("threshold", 0.2),
                n_coeffs=p.get("n_coeffs", 13),
                mfcc_coeffs=p.get("mfcc_coeffs", 13),
                pitch_refine=p.get("pitch_refine", "sinc"),
                refine_depth=p.get("refine_depth"),
            )
        except ValueError as e:
            # e.g. an unknown feature name — a client error, not a 500.
            raise RequestError(str(e))

    def analyze_request(self, body: bytes, query: str):
        """Decode + frame + dispatch one request; returns (format, payload)."""
        from voxtpu.cli import _bucket_target
        from voxtpu.io_wav import read_wav_bytes

        p = self._params(query)
        try:
            wav = read_wav_bytes(body, dtype=np.float32)
        except Exception as e:
            raise RequestError(f"cannot decode WAV body: {e}")
        samples, note = _select_channel(wav.samples, p.get("channel", "0"))
        config = self._config(float(wav.sample_rate), p)

        frames = _frame_host(samples, config.frame_len, config.hop)
        F = frames.shape[0]
        Fp = _bucket_target(F, self.cfg.bucket)
        if Fp != F:
            frames = np.pad(frames, [(0, Fp - F), (0, 0)])

        item = _Pending(frames, F)
        self.batcher.submit((config, Fp, config.frame_len), item)
        if not item.event.wait(self.cfg.request_timeout_s):
            raise TimeoutError(
                f"analysis timed out after {self.cfg.request_timeout_s}s "
                "(cold TPU compiles take minutes; retry or raise the timeout)"
            )
        if item.error is not None:
            raise RuntimeError(item.error)

        if p.get("viterbi") and config.pitch.enabled:
            # Host-side path search on the trimmed candidates (see _config).
            from voxtpu.viterbi import PathConfig, pitch_path_host

            lp = np.max(np.abs(frames[:F]), axis=-1)
            intensity = lp / np.maximum(np.max(lp), 1e-30)
            f0, s0 = pitch_path_host(
                item.result["pitch_candidates_freq"],
                item.result["pitch_candidates_strength"],
                item.result["pitch_candidates_valid"],
                PathConfig(ceiling=config.pitch.fmax),
                local_intensity=intensity,
            )
            s_best = np.clip(s0, 1e-6, 1.0 - 1e-6)
            hnr = (10.0 * np.log10(s_best / (1.0 - s_best))).astype(s0.dtype)
            item.result.update(
                f0=f0, f0_strength=s0, hnr_db=np.where(f0 > 0, hnr, -np.inf)
            )

        meta = {
            "frames": F,
            "sample_rate": float(wav.sample_rate),
            "frame_len": config.frame_len,
            "hop": config.hop,
        }
        if note:
            meta["note"] = note
        if p.get("format", "json") == "npz":
            buf = io.BytesIO()
            np.savez(buf, **item.result)
            return "npz", buf.getvalue()
        return "json", {**meta, "features": {k: _jsonable(v) for k, v in item.result.items()}}

    # ---- lifecycle ---------------------------------------------------------

    def health(self) -> dict:
        try:
            import jax

            dev = {
                "backend": jax.default_backend(),
                "device_count": jax.device_count(),
            }
        except Exception as e:  # pragma: no cover - backend init failure
            dev = {"backend_error": str(e)}
        return {"status": "ok", **dev}

    def warmup(self, sample_rate: float = 44100.0, shapes=None) -> None:
        """Pre-compile the default config's packed programs so first requests
        don't pay the cold compile.

        shapes: iterable of (B, Fp) pairs; default covers both ends — a lone
        small request (1, smallest rung) and a full batch at the top bucket
        (max_batch, bucket), the latter with the configured data_parallel.
        Other (B, Fp) combinations still compile on first use (and persist in
        the on-disk compile cache); each warm shape is minutes of remote-AOT
        on a cold TPU, so the default stays at two."""
        import jax.numpy as jnp

        config = self._config(sample_rate, dict(self.cfg.defaults))
        if shapes is None:
            shapes = [(1, 64)]
            if self.cfg.bucket and self.cfg.bucket != 64:
                shapes.append((self.cfg.max_batch, self.cfg.bucket))
        for B, rung in shapes:
            dp = self.cfg.data_parallel
            eff_dp = dp if dp > 1 and B >= dp else 1
            fn, _m = _packed_analyze(config, B, rung, config.frame_len, dp=eff_dp)
            np.asarray(fn(jnp.zeros((B, rung, config.frame_len), jnp.float32)))

    @property
    def address(self):
        return self.httpd.server_address[:2]

    def start(self):
        """Serve on a background thread (embedding/tests); returns (host, port)."""
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True, name="voxtpu-http")
        t.start()
        return self.address

    def serve_forever(self):
        host, port = self.address
        print(f"voxtpu serving on http://{host}:{port} "
              f"(window {self.cfg.window_ms} ms, max_batch {self.cfg.max_batch}, "
              f"bucket {self.cfg.bucket})", flush=True)
        try:
            self.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.shutdown()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.stop()
