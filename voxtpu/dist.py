"""Corpus-scale sharding over a TPU mesh.

The reference is a single-threaded library (SURVEY C28/C29: no threads, no
SIMD, no distribution — the caller loops frames serially). voxtpu makes scale
a first-class axis instead: a 2-D device mesh ("files", "frames") where

- the **files** axis is pure data parallelism over recordings, and
- the **frames** axis shards the frame batch of one recording — the analogue
  of sequence parallelism for arbitrarily long audio.

Every kernel is frame-parallel except the McCandless formant carry. For the
frames axis we use the blockwise-scan scheme from SURVEY §5: each shard
receives `overlap` halo frames from its left neighbor over ICI
(`jax.lax.ppermute`), warms its 6-slot estimate state up on them, then scans
its own frames; halo outputs are dropped. Shard 0's halo is zeroed — all-zero
frames are an exact no-op for the tracker (zero resonances never win the
write-back filter), so shard 0 starts from the configured seed estimates
exactly. With `overlap` greater than the tracker's mixing time (a few frames
in practice) shard boundaries converge to the serial trajectory.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze_frames,
)

__all__ = ["init_distributed", "make_mesh", "sharded_analyze", "dryrun_multichip"]


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization for corpus-scale runs.

    Maps hosts over DCN and chips over ICI: put the "files" mesh axis on the
    host (process) dimension — each recording's frames stay on one host's
    chips, so the only cross-host traffic is input scatter and feature gather;
    the frames-axis halo `ppermute` rides ICI within a host's slice. No-op in
    single-process environments (args default from cluster env vars).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_files_axis: int, n_frames_axis: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_files_axis * n_frames_axis
    if devices.size < need:
        raise ValueError(f"need {need} devices, have {devices.size}")
    grid = devices[:need].reshape(n_files_axis, n_frames_axis)
    return Mesh(grid, ("files", "frames"))


def sharded_analyze(
    frames: jax.Array,
    config: AnalysisConfig,
    mesh: Mesh,
    overlap: int = 8,
) -> dict:
    """Analyze (files, F, n) frames sharded over the mesh.

    files axis -> "files" (DP); frame axis -> "frames" (sequence sharding with
    halo hand-off for the formant carry).
    """
    frames = jnp.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    files, F, n = frames.shape
    nshards = mesh.shape["frames"]
    F_orig = F
    if F % nshards:
        # Pad with zero frames (an exact no-op for the formant tracker) and
        # trim the outputs back.
        pad = nshards - F % nshards
        frames = jnp.pad(frames, [(0, 0), (0, pad), (0, 0)])
        F = F + pad
    # The halo cannot exceed a shard's own frame count.
    overlap = min(overlap, F // nshards)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("files", "frames", None),
        out_specs=P("files", "frames"),
    )
    def run(local):  # (files_local, F_local, n)
        fl, Fl, _ = local.shape
        if nshards > 1 and overlap > 0:
            # halo: last `overlap` frames of the left neighbor, over ICI.
            tail = local[:, -overlap:, :]
            perm = [(i, (i + 1) % nshards) for i in range(nshards)]
            halo = jax.lax.ppermute(tail, "frames", perm)
            first = jax.lax.axis_index("frames") == 0
            halo = jnp.where(first, jnp.zeros_like(halo), halo)
            local = jnp.concatenate([halo, local], axis=1)

        flat = local.reshape(-1, local.shape[-1])
        out = analyze_frames(flat, config)
        out = {k: v.reshape((fl, local.shape[1]) + v.shape[1:]) for k, v in out.items()}
        if nshards > 1 and overlap > 0:
            out = {k: v[:, overlap:] for k, v in out.items()}
        return out

    # jit handles input resharding onto the mesh (eager shard_map requires
    # pre-sharded operands).
    out = jax.jit(run)(frames)
    if F_orig != F:
        out = {k: v[:, :F_orig] for k, v in out.items()}
    return out


def dryrun_multichip(n_devices: int) -> None:
    """Compile + run one sharded analysis step on an n-device mesh.

    Exercises the full feature pipeline (pitch + formants + MFCC + RMS) with
    both mesh axes populated when possible, on tiny shapes.
    """
    if jax.device_count() < n_devices:
        # Likely running under a single-chip TPU platform; the virtual
        # multi-device mesh lives on CPU.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        if jax.device_count() < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {jax.device_count()}; set "
                "XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} (and JAX_PLATFORMS=cpu) before importing jax"
            )
    devices = jax.devices()[:n_devices]
    files_axis = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    frames_axis = n_devices // files_axis
    mesh = make_mesh(files_axis, frames_axis, devices)

    frame_len, hop = 128, 64
    sr = 8000.0
    per_shard = 4
    F = frames_axis * per_shard
    files = files_axis

    rng = np.random.default_rng(0)
    t = np.arange(frame_len) / sr
    base = np.sin(2 * np.pi * 220.0 * t)
    frames = (
        base[None, None, :]
        + 0.1 * rng.standard_normal((files, F, frame_len))
    ).astype(np.float32)

    config = AnalysisConfig(
        sample_rate=sr,
        frame_len=frame_len,
        hop=hop,
        pitch=PitchConfig(fmin=150.0, fmax=400.0, max_candidates=8),
        formant=FormantConfig(n_coeffs=8),
        mfcc=MfccConfig(num_coeffs=8, freq_hi=3500.0),
    )

    out = sharded_analyze(jnp.asarray(frames), config, mesh, overlap=2)
    out = jax.tree.map(lambda x: np.asarray(x), out)
    assert out["f0"].shape == (files, F), out["f0"].shape
    assert np.all(np.isfinite(out["mfcc"]))
    print(
        f"dryrun_multichip ok: mesh={dict(mesh.shape)} f0 shape={out['f0'].shape} "
        f"status={out['status'].ravel().tolist()}"
    )
