"""Profiling and observability.

The reference's profiling story is Valgrind numbers pasted into comments
(``/root/reference/examples/pitch_detection.rs:35-41``) and `cargo bench`
one-liners (benches/periodic.rs:23-25). The TPU-native equivalents:

- `trace(...)`: context manager around `jax.profiler` producing a TensorBoard
  trace directory (per-kernel timing, HBM traffic);
- `timed(...)`: host-side wall-clock timing with a forced device->host fetch
  so remote-execution tunnels cannot under-report;
- `stage_report(...)`: per-stage timings for one config (the structured
  version of scripts/perf_stages.py).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "timed", "stage_report"]


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fetch(tree) -> float:
    import jax

    flat, _ = jax.tree.flatten(tree)
    total = 0.0
    for x in flat:
        if hasattr(x, "dtype") and x.dtype.kind == "f":
            total += float(np.asarray(x).ravel()[:1].sum())
    return total


def timed(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Best-of wall-clock seconds for fn(*args), fetch-synchronized."""
    for _ in range(warmup):
        _fetch(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_report(frames, config, iters: int = 3) -> dict:
    """Per-stage best-of timings (seconds) for one analysis config."""
    import dataclasses

    import jax

    from voxtpu.pipeline import analyze_frames

    def variant(**kw):
        c = config
        for k, v in kw.items():
            c = dataclasses.replace(c, **{k: dataclasses.replace(getattr(c, k), enabled=v)})
        return c

    out = {}
    base = variant(pitch=False, formant=False, mfcc=False)
    combos = {
        "rms": base,
        "mfcc": variant(pitch=False, formant=False, mfcc=True),
        "formants": variant(pitch=False, formant=True, mfcc=False),
        "pitch": variant(pitch=True, formant=False, mfcc=False),
        "full": config,
    }
    for name, cfg in combos.items():
        fn = jax.jit(lambda f, c=cfg: analyze_frames(f, c))
        out[name] = timed(fn, frames, iters=iters)
    return out
