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
  key gather for `window_ms` and run as ONE fixed-shape device dispatch —
  the MXU sees batches, not single files, and the per-dispatch latency
  (~25 ms through the axon tunnel; microseconds on local PJRT) amortizes
  across requests.
- **Samples-transport dispatch.** The batch ships as a host-stacked (B, S)
  block of RAW samples + true lengths and frames IN-GRAPH
  (`voxtpu.pipeline.analyze_batch_padded`, exact per-file isolation).
  Host-side framing would ship each sample frame_len/hop (~5x) times plus
  rung padding: measured 9.0 MB framed vs 0.5 MB raw for one 2.83 s clip (18x) —
  the difference dominated warm request latency through the tunnel
  (scripts/perf_serve.py, r5 frames-vs-samples A/B).

Endpoints:
  POST /analyze?<params>   WAV bytes in -> JSON (default) or npz features
  POST /stream/open?rate=<Hz>&<params>   open a streaming session -> session id
  POST /stream/append?session=ID        raw PCM bytes in -> completed chunks
  POST /stream/close?session=ID         flush tail (+ whole-stream Viterbi)
  POST /stream/abort?session=ID         drop a session
  GET  /healthz            liveness + backend/device inventory
  GET  /stats              request/batch/latency counters

Streaming (the reference's incremental FormantExtractor iterator idiom,
/root/reference/src/spectrum.rs:336-369, over HTTP): /analyze buffers the
whole WAV body (max_body_bytes cap), so an hour-long recording cannot ride
it. A /stream session instead accepts raw interleaved little-endian PCM
(encoding=f32le|s16le, channels=N, rate=<Hz> declared at open) in
arbitrarily-sized append bodies; each completed `chunk_frames`-frame chunk
runs warm on device with the formant carry threaded exactly (device-resident
between appends) and its features return on the append that completed it.
Server memory is bounded regardless of recording length; the concatenation
of all returned chunks equals the one-shot /analyze of the same audio.

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
import uuid
from collections import OrderedDict
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
    #: dispatcher pipelining: how many dispatched-but-unfetched batches may be
    #: in flight while the NEXT batch dispatches (VERDICT r4 #3 — the host
    #: stack/fetch/unpack work otherwise serializes with device compute).
    #: 1 = double-buffered (default; measured in scripts/perf_serve.py),
    #: 0 = strictly synchronous (fetch batch k before dispatching k+1).
    pipeline_depth: int = 1
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
    #: frames per streaming-session chunk (each session's compiled shape);
    #: clients may override at /stream/open unless param overrides are locked
    stream_chunk_frames: int = 512
    #: concurrent streaming sessions (each holds one chunk of samples + the
    #: device-resident formant carry; viterbi sessions also accumulate
    #: trimmed pitch candidates for the end-of-stream DP)
    max_streams: int = 64
    #: streaming sessions idle longer than this are garbage-collected
    stream_idle_timeout_s: float = 600.0
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
    __slots__ = ("samples", "F", "event", "result", "error", "t_enqueue")

    def __init__(self, samples: np.ndarray, F: int):
        # (L,) float32 raw samples, L = (F-1)*hop + frame_len exactly — the
        # dispatcher stacks SAMPLES and frames in-graph (framing on the host
        # would ship ~5x the bytes, hop-overlapped and rung-padded, through
        # the host->device link; measured in scripts/perf_serve.py).
        self.samples = samples
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


class _LRU:
    """Compiled-program cache, LRU-bounded and per-server: every entry is a
    full XLA executable (minutes of TPU compile each), and the key includes
    the request config — without a bound, a client varying an analysis param
    per request would grow it monotonically, and FIFO eviction could evict
    the hot shape under churn. Per-server (not module-global) so two
    VoxServers in one process can't cross-talk through shared executables
    keyed only by config, and `shutdown()` can release them. 64 programs is
    far above any sane deployment's working set; see
    ServeConfig.allow_param_overrides for stopping the compile COST itself."""

    def __init__(self, maxsize: int = 64):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()
        self._lock = threading.Lock()

    def get(self, key):
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
            return v

    def put(self, key, value) -> None:
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
            elif len(self._d) >= self.maxsize:
                self._d.popitem(last=False)
            self._d[key] = value

    def clear(self) -> None:
        with self._lock:
            self._d.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._d)


def _packed_analyze(config, B: int, Fp: int, n: int, dp: int = 1, cache: _LRU | None = None):
    """FRAMES-transport packed program: one per (config, B, Fp, n, dp) that
    runs `analyze_batch` on a host-framed (B, Fp, n) stack AND packs every
    feature FRAME-MAJOR into a single (B, Fp, W) float32 buffer (unpacked by
    pipeline._unpack_frames; the dispatcher slices off rung-padding rows
    before the fetch).

    NOT the production dispatch path since r5: `_packed_analyze_padded`
    (samples transport, in-graph framing) replaced it after the A/B measured
    the framed stack's ~5x host->device bytes dominating warm request
    latency through the tunnel. Kept as the A/B reference and for embedders
    that already hold framed tensors.

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
    if cache is not None:
        hit = cache.get(key)
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
        # FRAME-MAJOR (B, Fp, W): lets the dispatcher slice away bucket-rung
        # padding rows (Fp vs the batch's true max frame count) before the
        # fetch — at the top rung the padding is most of the bytes.
        return jnp.concatenate(
            [out[k].reshape(B, Fp, -1).astype(jnp.float32) for k, _s, _d in manifest],
            axis=2,
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
            out_shardings=NamedSharding(mesh, P("files", None, None)),
        )
    else:
        fn = jax.jit(packed)

    if cache is not None:
        cache.put(key, (fn, manifest))
    return fn, manifest


def _samples_for_frames(config, Fp: int) -> int:
    """Sample count whose in-graph framing yields exactly Fp frames."""
    return (Fp - 1) * config.hop + config.frame_len


def _packed_analyze_padded(config, B: int, Fp: int, dp: int = 1,
                           cache: _LRU | None = None):
    """Samples-transport sibling of `_packed_analyze`: one compiled program
    per (config, B, Fp, dp) taking a host-stacked (B, S) block of zero-padded
    RAW samples plus (B,) true lengths, framing IN-GRAPH
    (`pipeline.analyze_batch_padded`), and packing every feature FRAME-MAJOR
    into a single (B, Fp, W) float32 buffer.

    This is the production dispatch path. Shipping host-framed (B, Fp, n)
    stacks instead costs ~5x the host->device bytes (hop-overlap duplicates
    each sample frame_len/hop times, and the bucket rung pads the rest): the
    2.83 s two-vowels clip is 0.5 MB of samples but 9.0 MB framed at the
    1024 rung (18x) — ~200 ms through the ~40 MB/s axon tunnel, which dominated
    the measured warm request latency (scripts/perf_serve.py, the r5
    frames-vs-samples A/B). Frames never exist outside the graph; the same
    lesson the corpus runner's --batch-files path learned
    (pipeline.analyze_batch_padded docstring).
    """
    key = ("padded", config, B, Fp, dp)
    if cache is not None:
        hit = cache.get(key)
        if hit is not None:
            return hit
    import jax
    import jax.numpy as jnp

    from voxtpu.pipeline import analyze_batch_padded

    S = _samples_for_frames(config, Fp)
    spec = jax.eval_shape(
        analyze_batch_padded,
        jax.ShapeDtypeStruct((B, S), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        config,
    )
    manifest = [(k, tuple(v.shape), np.dtype(v.dtype)) for k, v in sorted(spec.items())]

    def packed(samples, lengths):
        out = analyze_batch_padded(samples, lengths, config)
        # FRAME-MAJOR (B, Fp, W): the dispatcher slices away bucket-rung
        # padding rows before the fetch (see _packed_analyze).
        return jnp.concatenate(
            [out[k].reshape(B, Fp, -1).astype(jnp.float32) for k, _s, _d in manifest],
            axis=2,
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
            in_shardings=(
                NamedSharding(mesh, P("files", None)),
                NamedSharding(mesh, P("files")),
            ),
            out_shardings=NamedSharding(mesh, P("files", None, None)),
        )
    else:
        fn = jax.jit(packed)

    if cache is not None:
        cache.put(key, (fn, manifest))
    return fn, manifest


def _packed_stream(config, Cf: int, n: int, cache: _LRU | None = None):
    """One compiled program per (config, Cf, n) running a single streaming
    chunk: in-graph framing of the chunk's RAW samples (samples transport —
    the same ~frame_len/hop host->device byte saving as
    `_packed_analyze_padded`, and no eager framing dispatches, ~25 ms each
    through the axon tunnel), `analyze_frames` with the carried formant
    estimates (/root/reference/src/spectrum.rs:336-369 — the incremental
    FormantExtractor iterator idiom), the per-frame peak for the
    end-of-stream Viterbi, and ONE packed (Cf, total) float32 output buffer,
    so each append costs a single device fetch through the axon tunnel. The
    (est_f, est_b) carry stays ON DEVICE between appends — threading it
    costs no roundtrips. `nf` (the chunk's real frame count) is traced, so
    partial final chunks reuse the same executable; frame rows >= nf overlap
    the real tail samples and are zeroed in-graph (exactly the old
    host-padded frame rows)."""
    key = ("stream", config, Cf, n)
    if cache is not None:
        hit = cache.get(key)
        if hit is not None:
            return hit
    import jax
    import jax.numpy as jnp

    from voxtpu.frame import frame_signal
    from voxtpu.pipeline import analyze_frames

    R = len(config.formant.estimates)
    est_spec = jax.ShapeDtypeStruct((R,), jnp.float32)
    S = (Cf - 1) * config.hop + n

    def run(samples, nf, est_f, est_b):
        frames = frame_signal(samples, n, config.hop)  # (Cf, n)
        mask = jnp.arange(Cf, dtype=jnp.int32) < nf
        frames = frames * mask[:, None].astype(frames.dtype)
        out = analyze_frames(frames, config, formant_estimates=(est_f, est_b))
        out["_stream_local_peak"] = jnp.max(jnp.abs(frames), axis=-1)
        if config.formant.enabled:
            # Carry from the last REAL frame (padded rows are a tracker
            # no-op, but the NEXT chunk must start from frame nf-1's state).
            new = (out["formant_freqs"][nf - 1], out["formant_bws"][nf - 1])
        else:
            new = (est_f, est_b)
        return out, new

    spec, _ = jax.eval_shape(
        run,
        jax.ShapeDtypeStruct((S,), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
        est_spec,
        est_spec,
    )
    manifest = [(k, tuple(v.shape), np.dtype(v.dtype)) for k, v in sorted(spec.items())]

    def packed(samples, nf, est_f, est_b):
        out, new = run(samples, nf, est_f, est_b)
        flat = jnp.concatenate(
            [out[k].reshape(Cf, -1).astype(jnp.float32) for k, _s, _d in manifest],
            axis=1,
        )
        return flat, new

    fn = jax.jit(packed)
    if cache is not None:
        cache.put(key, (fn, manifest))
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

    def __init__(self, cfg: ServeConfig, stats: "_Stats", cache: _LRU):
        self.cfg = cfg
        self.stats = stats
        self.cache = cache
        self.q: queue.Queue = queue.Queue()
        self._stopping = False
        self.thread = threading.Thread(target=self._loop, daemon=True, name="voxtpu-batcher")
        self.thread.start()

    def submit(self, key, item: _Pending) -> None:
        if self._stopping:
            # Fail fast: a submit landing after stop()'s final drain would
            # otherwise block its waiter the full request_timeout_s.
            item.error = "server shutting down"
            item.event.set()
            return
        self.q.put((key, item))
        if self._stopping:
            # stop() may have set the flag and drained between our check and
            # our put; drain again so THIS item can't be stranded.
            self._drain_shutdown()

    def stop(self) -> None:
        self._stopping = True
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
        # `inflight` holds dispatched-but-unfetched batches: while the device
        # computes batch k, the dispatcher may stack/dispatch batch k+1
        # (pipeline_depth > 0) instead of blocking on k's tunnel fetch +
        # host-side unpack (VERDICT r4 #3). Whenever the queue goes quiet,
        # everything in flight drains immediately — idle traffic never waits.
        inflight: list = []
        depth = max(0, int(self.cfg.pipeline_depth))
        while True:
            if inflight:
                try:
                    head = self.q.get_nowait()
                except queue.Empty:
                    for p in inflight:
                        self._drain(p)
                    inflight = []
                    continue
            else:
                head = self.q.get()
            if head is _STOP:
                for p in inflight:
                    self._drain(p)
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
                    p = self._dispatch(k, items[i : i + self.cfg.max_batch])
                    if p is not None:
                        inflight.append(p)
                    while len(inflight) > depth:
                        self._drain(inflight.pop(0))
            if stop:
                for p in inflight:
                    self._drain(p)
                return

    def _dispatch(self, key, items: list):
        """Stack + launch one batch; returns the in-flight record (or None if
        the dispatch itself failed — waiters already errored)."""
        config, Fp, n = key
        try:
            import jax.numpy as jnp

            B = _pow2_batch(len(items), self.cfg.max_batch)
            # Small batches stay on one device (a dp-wide dispatch would pad
            # a single request to dp files); full-enough batches shard over
            # the files mesh axis.
            dp = self.cfg.data_parallel
            eff_dp = dp if dp > 1 and B >= dp else 1
            # Stack raw SAMPLES, frame in-graph: each request's samples span
            # exactly its F frames ((F-1)*hop + frame_len), so the in-graph
            # length mask marks precisely the frames that exist.
            S = _samples_for_frames(config, Fp)
            stack = np.zeros((B, S), dtype=np.float32)
            lengths = np.zeros((B,), dtype=np.int32)
            for i, it in enumerate(items):
                stack[i, : it.samples.shape[0]] = it.samples
                lengths[i] = it.samples.shape[0]
            packed_fn, manifest = _packed_analyze_padded(
                config, B, Fp, dp=eff_dp, cache=self.cache
            )
            t0 = time.monotonic()
            flat_dev = packed_fn(jnp.asarray(stack), jnp.asarray(lengths))
            # Trim quantized to 64-frame steps: bounded slice-program
            # shapes under arbitrary request lengths.
            Fmaxb = min(Fp, max(64, (max(it.F for it in items) + 63) // 64 * 64))
            if Fmaxb < Fp:
                # Rung-padding trim before the fetch: async device slice,
                # pipelines behind the batch compute; cuts fetched bytes to
                # the frames that exist (measured in scripts/perf_serve.py).
                flat_dev = flat_dev[:, :Fmaxb, :]
            return (key, items, B, flat_dev, manifest, t0)
        except Exception:  # surface device/compile failures to every waiter
            err = traceback.format_exc()
            for it in items:
                it.error = err
                it.event.set()
            return None

    def _drain(self, pending) -> None:
        """Fetch + unpack one in-flight batch and release its waiters."""
        key, items, B, flat_dev, manifest, t0 = pending
        try:
            flat = np.asarray(flat_dev)  # blocks until the device finishes
            dt = time.monotonic() - t0
            self.stats.record_batch(len(items), B, dt, key)
            from voxtpu.pipeline import _unpack_frames

            out = _unpack_frames(flat, manifest)
            for i, it in enumerate(items):
                it.result = {k: v[i, : it.F] for k, v in out.items()}
                it.event.set()
        except Exception:
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
        self.stream_sessions = 0
        self.stream_chunks = 0
        self.stream_frames = 0
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

    def record_stream_chunk(self, nf: int, device_s: float, shape) -> None:
        with self.lock:
            self.stream_chunks += 1
            self.stream_frames += nf
            self.shapes.add(shape)
            self.device_s += device_s

    def record_stream_session(self) -> None:
        with self.lock:
            self.stream_sessions += 1

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
                "stream_sessions": self.stream_sessions,
                "stream_chunks": self.stream_chunks,
                "stream_frames": self.stream_frames,
            }


def _viterbi_host(result: dict, local_peak: np.ndarray, fmax: float) -> dict:
    """Whole-recording Viterbi path search on TRIMMED host-side candidates
    (see VoxServer._config for why it never runs in the padded device
    program); returns the f0/f0_strength/hnr_db feature update."""
    from voxtpu.pipeline import f0_outputs_host
    from voxtpu.viterbi import PathConfig, pitch_path_host

    intensity = local_peak / np.maximum(np.max(local_peak), 1e-30)
    f0, s0 = pitch_path_host(
        result["pitch_candidates_freq"],
        result["pitch_candidates_strength"],
        result["pitch_candidates_valid"],
        PathConfig(ceiling=fmax),
        local_intensity=intensity,
    )
    return f0_outputs_host(f0, s0)


_STREAM_PARAMS = {"rate", "encoding", "channels", "chunk_frames"}
_STREAM_ENCODINGS = ("f32le", "s16le")


class _StreamSession:
    """One `/stream/*` session: byte-level PCM reassembly + channel selection
    in front of a packed `voxtpu.pipeline.StreamAnalyzer`.

    Wire format is raw interleaved little-endian PCM at the rate/encoding/
    channels declared at `/stream/open` — no per-request WAV framing, because
    the point is recordings LONGER than any whole-body upload
    (`max_body_bytes` applies per append, never to the recording). Appends
    may split samples and frames arbitrarily: a partial-sample byte tail and
    the analyzer's ``frame_len - hop`` sample tail carry across appends, so
    server memory stays bounded regardless of stream length. The formant
    carry lives ON DEVICE between appends (`_packed_stream`), matching the
    reference's incremental FormantExtractor iterator
    (/root/reference/src/spectrum.rs:336-369) with exact state hand-off.
    Viterbi sessions additionally accumulate the trimmed per-chunk pitch
    candidates + frame peaks — the whole-recording DP inherently needs them —
    and run `pitch_path_host` once at close."""

    _DTYPES = {"f32le": np.dtype("<f4"), "s16le": np.dtype("<i2")}

    def __init__(self, sid: str, config, p: dict, cache: _LRU, stats: _Stats,
                 chunk_frames: int):
        from voxtpu.pipeline import StreamAnalyzer

        self.sid = sid
        self.config = config
        self.cache = cache
        self.stats = stats
        self.lock = threading.Lock()
        self.last_used = time.monotonic()
        self.encoding = p.get("encoding", "f32le")
        self.dtype = self._DTYPES[self.encoding]
        self.channels = int(p.get("channels", 1))
        self.channel = str(p.get("channel", "0"))
        self.fmt = p.get("format", "json")
        self.byte_tail = b""
        self.closed = False
        self.viterbi = bool(p.get("viterbi")) and config.pitch.enabled
        self._vit_acc: list = []
        self.analyzer = StreamAnalyzer(
            config, chunk_frames, step_samples=self._packed_step
        )

    # StreamAnalyzer step_samples override: raw samples in (framing happens
    # in-graph — ~frame_len/hop fewer host->device bytes, no eager framing
    # dispatches), one packed dispatch + ONE fetch per chunk (each naive
    # per-feature fetch is a ~25 ms tunnel roundtrip).
    def _packed_step(self, samples, nf, est):
        import jax.numpy as jnp

        n = self.config.frame_len
        Cf = self.analyzer.chunk_frames
        fn, manifest = _packed_stream(self.config, Cf, n, cache=self.cache)
        if est is None:
            est_f = jnp.asarray(self.config.formant.estimates, dtype=jnp.float32)
            est = (est_f, jnp.full_like(est_f, self.config.formant.estimate_bandwidth))
        t0 = time.monotonic()
        flat, new_est = fn(jnp.asarray(samples, jnp.float32), jnp.int32(nf), *est)
        if int(nf) < Cf:
            # Final-partial-chunk trim: the stream layout is already
            # frame-major (rows = frames), so slice off the pad rows before
            # the fetch (StreamAnalyzer re-trims to nf — a no-op after this).
            flat = flat[:nf]
        flat = np.asarray(flat)  # the only roundtrip; new_est stays on device
        self.stats.record_stream_chunk(nf, time.monotonic() - t0, (1, Cf, n))
        return _unpack(flat, manifest), new_est

    def _decode(self, body: bytes) -> np.ndarray:
        data = self.byte_tail + body
        unit = self.dtype.itemsize * self.channels
        keep = len(data) // unit * unit
        self.byte_tail = data[keep:]
        x = np.frombuffer(data[:keep], dtype=self.dtype)
        if self.dtype.kind == "i":
            # The reference's integer normalization at 16 valid bits:
            # s / (i32::MAX >> 16) == s / 32767 (tests/lib.rs:17-19).
            x = x.astype(np.float32) / 32767.0
        else:
            x = x.astype(np.float32)
        if self.channels > 1:
            x = x.reshape(-1, self.channels)
            mono, _note = _select_channel(x, self.channel)
            return np.ascontiguousarray(mono, dtype=np.float32)
        return x

    def _collect(self, chunks: list) -> tuple[int, dict]:
        """Accumulate viterbi state; concatenate the client-visible features."""
        if self.viterbi:
            for c in chunks:
                self._vit_acc.append({
                    "freq": np.asarray(c["pitch_candidates_freq"]),
                    "strength": np.asarray(c["pitch_candidates_strength"]),
                    "valid": np.asarray(c["pitch_candidates_valid"]),
                    "peak": np.asarray(c["_stream_local_peak"]),
                })
        feats: dict = {}
        nf = 0
        if chunks:
            keys = [k for k in chunks[0] if not k.startswith("_")]
            feats = {
                k: np.concatenate([np.asarray(c[k]) for c in chunks]) for k in keys
            }
            nf = int(sum(np.asarray(c["_stream_local_peak"]).shape[0] for c in chunks))
        return nf, feats

    def append(self, body: bytes) -> tuple[int, dict]:
        self.last_used = time.monotonic()
        return self._collect(self.analyzer.feed(self._decode(body)))

    def close(self, body: bytes) -> tuple[int, dict, dict | None]:
        """Flush the tail chunk; run the end-of-stream Viterbi if requested.
        Returns (tail_frames, tail_features, viterbi_features_or_None) where
        the viterbi features span the WHOLE stream (frames_done long)."""
        chunks = self.analyzer.feed(self._decode(body)) if body else []
        chunks += self.analyzer.finish()
        nf, feats = self._collect(chunks)
        vit = None
        if self.viterbi:
            vit = {}
            if self._vit_acc:
                full = {
                    "pitch_candidates_freq": np.concatenate([a["freq"] for a in self._vit_acc]),
                    "pitch_candidates_strength": np.concatenate([a["strength"] for a in self._vit_acc]),
                    "pitch_candidates_valid": np.concatenate([a["valid"] for a in self._vit_acc]),
                }
                peak = np.concatenate([a["peak"] for a in self._vit_acc])
                vit = _viterbi_host(full, peak, self.config.pitch.fmax)
        self.closed = True
        return nf, feats, vit


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
        self.cache = _LRU()
        self.batcher = _MicroBatcher(cfg, self.stats, self.cache)
        self._streams: dict = {}
        self._streams_lock = threading.Lock()
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

            _POST_ROUTES = (
                "/analyze", "/stream/open", "/stream/append", "/stream/close",
                "/stream/abort",
            )

            def do_POST(self):  # noqa: N802
                t0 = time.monotonic()
                parsed = urllib.parse.urlparse(self.path)
                path = parsed.path
                if path not in self._POST_ROUTES:
                    self._json(404, {"error": f"unknown path {path}"})
                    return
                ok = False
                try:
                    length = int(self.headers.get("Content-Length", 0) or 0)
                    if length > server.cfg.max_body_bytes:
                        raise RequestError(
                            f"body too large ({length} > {server.cfg.max_body_bytes}"
                            "); for long recordings use /stream/open + append"
                        )
                    body = self.rfile.read(length) if length > 0 else b""
                    if path == "/analyze":
                        if not body:
                            raise RequestError("empty body (expected WAV bytes)")
                        self._emit(*server.analyze_request(body, parsed.query))
                    elif path == "/stream/open":
                        self._json(200, server.stream_open(parsed.query))
                    elif path == "/stream/append":
                        if not body:
                            raise RequestError("empty body (expected raw PCM bytes)")
                        self._emit(*server.stream_append(parsed.query, body))
                    elif path == "/stream/close":
                        self._emit(*server.stream_close(parsed.query, body))
                    else:  # /stream/abort
                        self._json(200, server.stream_abort(parsed.query))
                    ok = True
                except RequestError as e:
                    self._json(400, {"error": str(e)})
                except TimeoutError as e:
                    self._json(503, {"error": str(e)})
                except Exception:
                    self._json(500, {"error": traceback.format_exc(limit=20)})
                finally:
                    server.stats.record_request(time.monotonic() - t0, ok)

            def _emit(self, fmt, payload):
                if fmt == "npz":
                    self._bytes(200, payload, "application/octet-stream")
                else:
                    self._json(200, payload)

            def _json(self, code, obj):
                data = json.dumps(obj).encode()
                self._bytes(code, data, "application/json")

            def _bytes(self, code, data, ctype):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        # http.server's default accept backlog is 5: a 16-connection burst
        # overflows it and clients see ConnectionResetError before the
        # request is even read (observed in scripts/perf_serve.py's
        # saturation sweep). Size it to the traffic the batcher is built for.
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128

        self.httpd = _Server((cfg.host, cfg.port), Handler)
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

        if samples.shape[0] < config.frame_len:
            raise RequestError(
                f"audio shorter than one frame "
                f"({samples.shape[0]} < {config.frame_len} samples)"
            )
        F = (samples.shape[0] - config.frame_len) // config.hop + 1
        Fp = _bucket_target(F, self.cfg.bucket)
        # Trim the tail past the last frame's window (no frame reads it, in
        # either framing); the dispatcher zero-pads rows to the rung's S.
        L = (F - 1) * config.hop + config.frame_len
        samples = np.ascontiguousarray(samples[:L], dtype=np.float32)

        item = _Pending(samples, F)
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
            frames_h = _frame_host(samples, config.frame_len, config.hop)
            lp = np.max(np.abs(frames_h[:F]), axis=-1)
            item.result.update(_viterbi_host(item.result, lp, config.pitch.fmax))

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

    # ---- streaming sessions -------------------------------------------------
    # Long recordings cannot ride /analyze (whole-body upload, max_body_bytes
    # cap): /stream/open declares the wire format, /stream/append pushes raw
    # PCM in arbitrarily-sized bodies, /stream/close flushes the tail and
    # runs the end-of-stream Viterbi. Bounded server memory at any length.

    def _stream_session_params(self, query: str) -> tuple[dict, dict]:
        """Split /stream/open's query into (analysis params via _params,
        validated stream wire params)."""
        raw = urllib.parse.parse_qs(query, keep_blank_values=True)
        sp = {k: raw.pop(k)[-1] for k in list(raw) if k in _STREAM_PARAMS}
        if not self.cfg.allow_param_overrides and "chunk_frames" in sp:
            raise RequestError(
                "chunk_frames overrides are disabled on this server (each "
                "distinct chunk shape is its own compiled program)"
            )
        p = self._params(urllib.parse.urlencode(
            [(k, v) for k, vs in raw.items() for v in vs]
        ))
        out: dict = {}
        try:
            out["rate"] = float(sp["rate"]) if "rate" in sp else 0.0
        except ValueError:
            raise RequestError(f"bad value for rate: {sp['rate']!r}")
        if out["rate"] <= 0:
            raise RequestError("stream open requires rate=<Hz> (> 0); raw PCM "
                               "bodies carry no WAV header to read it from")
        out["encoding"] = sp.get("encoding", "f32le")
        if out["encoding"] not in _STREAM_ENCODINGS:
            raise RequestError(
                f"encoding must be one of {_STREAM_ENCODINGS}, got {out['encoding']!r}"
            )
        try:
            out["channels"] = int(sp.get("channels", 1))
            out["chunk_frames"] = int(sp.get("chunk_frames", self.cfg.stream_chunk_frames))
        except ValueError:
            raise RequestError("channels and chunk_frames must be integers")
        if not 1 <= out["channels"] <= 64:
            raise RequestError(f"channels must be in [1, 64], got {out['channels']}")
        if not 8 <= out["chunk_frames"] <= 16384:
            raise RequestError(
                f"chunk_frames must be in [8, 16384], got {out['chunk_frames']}"
            )
        return p, out

    def _gc_streams(self) -> None:
        cutoff = time.monotonic() - self.cfg.stream_idle_timeout_s
        with self._streams_lock:
            for sid in [s for s, v in self._streams.items() if v.last_used < cutoff]:
                del self._streams[sid]

    def _get_stream(self, query: str, extra_params=()) -> tuple["_StreamSession", dict]:
        raw = urllib.parse.parse_qs(query, keep_blank_values=True)
        unknown = set(raw) - {"session", "format"} - set(extra_params)
        if unknown:
            raise RequestError(f"unknown parameter(s): {sorted(unknown)}")
        sid = raw.get("session", [None])[-1]
        if not sid:
            raise RequestError("missing session=<id> (from /stream/open)")
        with self._streams_lock:
            sess = self._streams.get(sid)
        if sess is None:
            raise RequestError(f"unknown or expired stream session: {sid}")
        fmt = raw.get("format", [sess.fmt])[-1]
        if fmt not in ("json", "npz"):
            raise RequestError("format must be 'json' or 'npz'")
        sess.last_used = time.monotonic()
        return sess, {"format": fmt}

    def stream_open(self, query: str) -> dict:
        p, sp = self._stream_session_params(query)
        config = self._config(sp["rate"], p)
        # Streaming needs a real hop-advancing analysis; a degenerate
        # channel index is rejected here, not at the first append.
        if str(p.get("channel", "0")).strip().lower() != "mix":
            if int(p.get("channel", "0")) >= sp["channels"]:
                raise RequestError(
                    f"channel {p.get('channel')} out of range: stream "
                    f"declares {sp['channels']} channel(s)"
                )
        self._gc_streams()
        with self._streams_lock:
            if len(self._streams) >= self.cfg.max_streams:
                raise TimeoutError(
                    f"too many open streams ({self.cfg.max_streams}); retry later"
                )
            sid = uuid.uuid4().hex
            sess = _StreamSession(
                sid, config, {**p, "encoding": sp["encoding"],
                              "channels": sp["channels"]},
                self.cache, self.stats, sp["chunk_frames"],
            )
            self._streams[sid] = sess
        self.stats.record_stream_session()
        return {
            "session": sid,
            "chunk_frames": sess.analyzer.chunk_frames,
            "frame_len": config.frame_len,
            "hop": config.hop,
            "sample_rate": sp["rate"],
            "encoding": sp["encoding"],
            "channels": sp["channels"],
            "viterbi": sess.viterbi,
        }

    def _stream_payload(self, sess, fmt, nf, feats, vit=None, closed=False):
        meta = {
            "session": sess.sid,
            "frames": nf,
            "frames_done": sess.analyzer.frames_done,
            "buffered_samples": sess.analyzer.buffered_samples,
        }
        if fmt == "npz":
            buf = io.BytesIO()
            arrays = dict(feats)
            if vit is not None:
                arrays.update({f"viterbi_{k}": v for k, v in vit.items()})
            np.savez(buf, **arrays)
            return "npz", buf.getvalue()
        out = {**meta, "features": {k: _jsonable(v) for k, v in feats.items()}}
        if vit is not None:
            out["viterbi"] = {k: _jsonable(v) for k, v in vit.items()}
        if closed:
            out["closed"] = True
        return "json", out

    def stream_append(self, query: str, body: bytes):
        sess, p = self._get_stream(query)
        with sess.lock:
            if sess.closed:
                raise RequestError("stream session already closed")
            nf, feats = sess.append(body)
            return self._stream_payload(sess, p["format"], nf, feats)

    def stream_close(self, query: str, body: bytes):
        """Close a session: an optional final PCM body is fed first, the
        partial tail chunk is flushed, and (if the session opened with
        viterbi=1) the whole-stream path search runs on the accumulated
        trimmed candidates — full-length f0/f0_strength/hnr_db come back
        under "viterbi" (JSON) / "viterbi_*" keys (npz)."""
        sess, p = self._get_stream(query)
        with sess.lock:
            if sess.closed:
                raise RequestError("stream session already closed")
            nf, feats, vit = sess.close(body)
            payload = self._stream_payload(
                sess, p["format"], nf, feats, vit=vit, closed=True
            )
        with self._streams_lock:
            self._streams.pop(sess.sid, None)
        return payload

    def stream_abort(self, query: str) -> dict:
        sess, _p = self._get_stream(query)
        with self._streams_lock:
            self._streams.pop(sess.sid, None)
        return {"session": sess.sid, "aborted": True,
                "frames_done": sess.analyzer.frames_done}

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

    def warmup(self, sample_rate: float | None = None, shapes=None) -> None:
        """Pre-compile the default config's packed programs so first requests
        don't pay the cold compile.

        sample_rate: a single rate to warm; None warms every configured
        `allowed_rates` entry (a locked-down server must serve its FIRST real
        request warm, whatever its pinned rates are), falling back to 44.1 kHz
        when no rates are pinned.

        shapes: iterable of (B, Fp) pairs; default covers both ends — a lone
        small request (1, smallest rung) and a full batch at the top bucket
        (max_batch, bucket), the latter with the configured data_parallel.
        Other (B, Fp) combinations still compile on first use (and persist in
        the on-disk compile cache); each warm shape is minutes of remote-AOT
        on a cold TPU, so the default stays at two per rate."""
        import jax.numpy as jnp

        rates = (
            (sample_rate,) if sample_rate is not None
            else (self.cfg.allowed_rates or (44100.0,))
        )
        if shapes is None:
            shapes = [(1, 64)]
            if self.cfg.bucket and self.cfg.bucket != 64:
                shapes.append((self.cfg.max_batch, self.cfg.bucket))
        for rate in rates:
            config = self._config(float(rate), dict(self.cfg.defaults))
            for B, rung in shapes:
                dp = self.cfg.data_parallel
                eff_dp = dp if dp > 1 and B >= dp else 1
                fn, _m = _packed_analyze_padded(
                    config, B, rung, dp=eff_dp, cache=self.cache
                )
                S = _samples_for_frames(config, rung)
                np.asarray(fn(jnp.zeros((B, S), jnp.float32),
                              jnp.zeros((B,), jnp.int32)))

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
        with self._streams_lock:
            self._streams.clear()
        # Release the compiled executables (embedding scenarios create and
        # destroy servers in one process; a leaked cache pins device programs).
        self.cache.clear()
