"""Corpus-scale sharding over a TPU mesh.

The reference is a single-threaded library (SURVEY C28/C29: no threads, no
SIMD, no distribution — the caller loops frames serially). voxtpu makes scale
a first-class axis instead: a 2-D device mesh ("files", "frames") where

- the **files** axis is pure data parallelism over recordings, and
- the **frames** axis shards the frame batch of one recording — the analogue
  of sequence parallelism for arbitrarily long audio.

Every kernel is frame-parallel except the 6-slot McCandless formant carry
(and the optional Viterbi pitch path). Those sequential stages consume tiny
per-frame summaries (32 resonances / 32 pitch candidates per frame), so the
expensive work (LPC, Laguerre roots, autocorrelation FFTs, Brent refinement)
always runs fully sharded, and the carry is handled one of two ways:

- **exact (default)**: the per-frame resonance buffers are gathered off the
  shard_map and the McCandless scan runs over the full frame axis, exactly as
  in the serial path — bit-identical to `analyze` per file, matching the
  reference's strictly sequential `FormantExtractor` semantics
  (/root/reference/src/spectrum.rs:336-369). The gathered state is
  O(F * 32) floats; the scan is a negligible fraction of pipeline time
  (PERFORMANCE.md), so exactness costs ~nothing.
- **approximate (exact=False)**: each shard receives the last `overlap`
  frames' *resonances* from its left neighbor over ICI (`jax.lax.ppermute`),
  warms its estimate state on them, then scans its own frames; halo outputs
  are dropped. Shard 0's halo is zeroed — all-zero resonance frames are an
  exact no-op for the tracker, so shard 0 starts from the configured seed
  exactly. With `overlap` past the tracker's mixing time the boundaries
  converge to the serial trajectory. Fully local compute; no cross-shard
  sequential dependency.

Per-file isolation: the tracker (and Viterbi) run per file, never across file
boundaries, including when one device holds several files.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from voxtpu.formants import formant_tracker_batched
from voxtpu.pipeline import (
    AnalysisConfig,
    FormantConfig,
    MfccConfig,
    PitchConfig,
    analyze_frames,
    f0_outputs,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "sharded_analyze",
    "dryrun_multichip",
    "launch_multiprocess_dryrun",
]


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization for corpus-scale runs.

    Maps hosts over DCN and chips over ICI: put the "files" mesh axis on the
    host (process) dimension — each recording's frames stay on one host's
    chips, so the only cross-host traffic is input scatter and feature gather;
    the frames-axis collectives ride ICI within a host's slice. Safe to call
    in single-process environments: jax.distributed.initialize with
    num_processes=1 is a local no-op cluster.
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


def _track_per_file(rf, rb, est_f, est_b):
    """McCandless tracker over (files, F, R) resonances, one independent
    carry per file (the reference's estimates buffer is per recording).
    Single-trace regardless of files-per-batch (VERDICT r2 #7)."""
    return formant_tracker_batched(rf, rb, est_f, est_b)


def sharded_analyze(
    frames: jax.Array,
    config: AnalysisConfig,
    mesh: Mesh,
    overlap: int = 8,
    exact: bool = True,
) -> dict:
    """Analyze (files, F, n) frames sharded over the mesh.

    files axis -> "files" (DP); frame axis -> "frames" (sequence sharding).
    The formant carry follows the `exact` flag — see the module docstring;
    the Viterbi pitch path (when enabled) ALWAYS runs exactly over the
    gathered per-frame candidate summaries, since its DP and global
    intensity peak span the whole recording. `overlap` only matters with
    exact=False.
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

    do_formants = config.formant.enabled
    do_viterbi = config.pitch.enabled and config.pitch.viterbi
    # The sequential stages run outside analyze_frames (exactly, over the full
    # frame axis, after trimming); inside the shard body everything must be
    # frame-parallel.
    inner = config
    if do_viterbi:
        inner = dataclasses.replace(
            inner, pitch=dataclasses.replace(inner.pitch, viterbi=False)
        )

    est_f = jnp.asarray(config.formant.estimates, dtype=frames.dtype)
    est_b = jnp.full_like(est_f, config.formant.estimate_bandwidth)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("files", "frames", None),
        out_specs=P("files", "frames"),
    )
    def run(local):  # (files_local, F_local, n)
        fl, Fl, _ = local.shape
        # Frame-parallel stages carry no cross-frame state, so flattening
        # (files_local, F_local) into one batch is safe here — the sequential
        # stages below always operate per file.
        flat = local.reshape(-1, local.shape[-1])
        out = analyze_frames(flat, inner, return_formant_candidates=do_formants)
        out = {k: v.reshape((fl, Fl) + v.shape[1:]) for k, v in out.items()}
        if do_viterbi:
            # Per-frame intensity summary for the silence-aware path search.
            out["local_peak"] = jnp.max(jnp.abs(local), axis=-1)

        if do_formants and not exact:
            rf = out.pop("resonance_freqs")  # (fl, Fl, R)
            rb = out.pop("resonance_bws")
            if nshards > 1 and overlap > 0:
                # Halo: the left neighbor's last `overlap` frames' resonances,
                # over ICI. Far cheaper than re-deriving them from raw frames:
                # the halo is (fl, overlap, 32) floats and the warmup re-runs
                # only the 6-slot tracker step, not LPC/roots.
                perm = [(i, (i + 1) % nshards) for i in range(nshards)]
                halo_f = jax.lax.ppermute(rf[:, -overlap:], "frames", perm)
                halo_b = jax.lax.ppermute(rb[:, -overlap:], "frames", perm)
                first = jax.lax.axis_index("frames") == 0
                halo_f = jnp.where(first, jnp.zeros_like(halo_f), halo_f)
                halo_b = jnp.where(first, jnp.zeros_like(halo_b), halo_b)
                rf = jnp.concatenate([halo_f, rf], axis=1)
                rb = jnp.concatenate([halo_b, rb], axis=1)
            freqs, bws = _track_per_file(rf, rb, est_f, est_b)
            if nshards > 1 and overlap > 0:
                freqs, bws = freqs[:, overlap:], bws[:, overlap:]
            out["formant_freqs"] = freqs
            out["formant_bws"] = bws
        return out

    # jit handles input resharding onto the mesh (eager shard_map requires
    # pre-sharded operands).
    out = jax.jit(run)(frames)
    if F_orig != F:
        out = {k: v[:, :F_orig] for k, v in out.items()}

    if do_formants and exact:
        # Exact carry: the full resonance sequence is tiny (F x 32 floats per
        # file); run the strictly sequential scan over it whole, identically
        # to the serial path (spectrum.rs:336-369 semantics), after trimming
        # so padded frames never enter the carry.
        rf = out.pop("resonance_freqs")
        rb = out.pop("resonance_bws")
        freqs, bws = _track_per_file(rf, rb, est_f, est_b)
        out["formant_freqs"] = freqs
        out["formant_bws"] = bws

    if do_viterbi:
        from voxtpu.viterbi import PathConfig, pitch_path

        local_peak = out.pop("local_peak")  # (files, F_orig)
        global_peak = jnp.max(local_peak, axis=1, keepdims=True)
        intensity = local_peak / jnp.maximum(global_peak, 1e-30)
        cfg = PathConfig(ceiling=config.pitch.fmax)
        f0, s0 = jax.vmap(
            lambda f, s, v, li: pitch_path(f, s, v, cfg, local_intensity=li)
        )(
            out["pitch_candidates_freq"],
            out["pitch_candidates_strength"],
            out["pitch_candidates_valid"],
            intensity,
        )
        out.update(f0_outputs(f0, s0))

    return out


def dryrun_case(files: int, F: int, frame_len: int = 128, hop: int = 64,
                sr: float = 8000.0):
    """The tiny deterministic fixture shared by every multichip dryrun
    (single-process and multi-process workers must analyze identical data so
    the cross-process shard check has a meaning). Returns (frames, config)."""
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
        pitch=PitchConfig(fmin=150.0, fmax=400.0, max_candidates=8, viterbi=True),
        formant=FormantConfig(n_coeffs=8),
        mfcc=MfccConfig(num_coeffs=8, freq_hi=3500.0),
    )
    return frames, config


def launch_multiprocess_dryrun(
    n_devices: int = 8, n_processes: int = 2, timeout: float = 900.0
) -> None:
    """Run a REAL multi-process `jax.distributed` cluster (SURVEY C29).

    Spawns `n_processes` fresh worker interpreters, each with
    `n_devices // n_processes` virtual CPU devices, coordinated through a
    localhost `jax.distributed.initialize` cluster (the DCN analogue: CPU
    collectives ride gloo between the processes). Each worker builds the mesh
    over ALL global devices — the "files" axis spans the process boundary
    exactly as hosts span DCN in the deployment design (module docstring) —
    runs `sharded_analyze` on the shared dryrun fixture, and asserts its own
    addressable output shards match a locally-computed serial reference.

    This is pure subprocess orchestration: the calling process's jax backend
    (TPU or CPU, already initialized or not) is never touched.
    """
    import os
    import socket
    import subprocess
    import sys

    if n_devices % n_processes:
        raise ValueError(f"{n_devices} devices not divisible by {n_processes} processes")
    local_devices = n_devices // n_processes
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coordinator = f"127.0.0.1:{port}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "voxtpu._dist_worker",
                "--process-id", str(i),
                "--num-processes", str(n_processes),
                "--coordinator", coordinator,
                "--local-devices", str(local_devices),
            ],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n_processes)
    ]
    outputs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n[launcher] TIMEOUT"
        outputs.append(out)
        rcs.append(p.returncode)
    for i, out in enumerate(outputs):
        sys.stdout.write(out)
    sys.stdout.flush()
    ok_lines = sum("multiprocess dryrun ok" in out for out in outputs)
    if any(rc != 0 for rc in rcs) or ok_lines != n_processes:
        raise RuntimeError(
            f"multiprocess dryrun failed: rcs={rcs}, ok_lines={ok_lines}/"
            f"{n_processes}\n" + "\n".join(o[-2000:] for o in outputs)
        )


def default_topologies(n_devices: int) -> list[tuple[int, int]]:
    """(files, frames) mesh shapes exercised by the dryrun: every
    factorization of n_devices, plus a 1x2 sub-mesh (fewer devices than
    available — a deployment reality the full-mesh cases never hit)."""
    topos = [
        (f, n_devices // f) for f in range(1, n_devices + 1) if n_devices % f == 0
    ]
    if n_devices > 2:
        topos.append((1, 2))
    return topos


def _serial_reference(frames: np.ndarray, config: AnalysisConfig) -> dict:
    """Per-file serial analyze_frames — the ground truth every topology's
    exact-mode output must reproduce."""
    out: dict = {}
    for i in range(frames.shape[0]):
        s = analyze_frames(jnp.asarray(frames[i]), config)
        for k, v in s.items():
            out.setdefault(k, []).append(np.asarray(v))
    return {k: np.stack(v) for k, v in out.items()}


def dryrun_multichip(n_devices: int, topologies=None) -> None:
    """Compile + run sharded analysis over a MATRIX of mesh topologies
    (VERDICT r3 #4 — one 2x4 case is thin evidence for a sharding design).

    For each (files, frames) topology: the full feature pipeline (pitch +
    Viterbi + formants with the exact cross-shard carry + MFCC + RMS) runs on
    tiny shapes with (a) multiple files per device row plus one extra —
    uneven files-per-row, zero-padded exactly as the corpus runner pads, and
    (b) a frame count NOT divisible by the frames axis (the internal pad
    path). Exact mode is asserted equal to a per-file serial reference; the
    halo (approximate) mode must compile + run on the widest mesh.
    """
    # Exercise the multi-host init path (a 1-process no-op cluster) as far as
    # a single host allows — must precede any backend-initializing jax call.
    # Ephemeral coordinator port: a fixed one collides when several dryrun
    # children run concurrently (the coordination service aborts on a second
    # "incarnation" of task 0).
    try:
        import socket

        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        init_distributed(
            coordinator_address=f"localhost:{port}", num_processes=1, process_id=0
        )
    except Exception as e:  # backend already initialized (e.g. under pytest)
        print(f"init_distributed skipped: {type(e).__name__}: {e}")
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
    if topologies is None:
        topologies = default_topologies(n_devices)

    for files_axis, frames_axis in topologies:
        devices = jax.devices()[: files_axis * frames_axis]
        mesh = make_mesh(files_axis, frames_axis, devices)

        per_shard = 4
        # Uneven F: not a multiple of the frames axis when sharded, so the
        # internal zero-frame pad + trim path runs.
        F = frames_axis * per_shard + (3 if frames_axis > 1 else 0)
        # Uneven files-per-row: one more real file than a multiple of the
        # files axis; pad with zero files the way the corpus runner does.
        real_files = files_axis + 1 if files_axis > 1 else 2
        files = -(-real_files // files_axis) * files_axis
        frames, config = dryrun_case(real_files, F)
        padded = np.concatenate(
            [frames, np.zeros((files - real_files,) + frames.shape[1:], frames.dtype)]
        )

        out = sharded_analyze(jnp.asarray(padded), config, mesh, exact=True)
        out = jax.tree.map(lambda x: np.asarray(x), out)
        assert out["f0"].shape == (files, F), out["f0"].shape

        serial = _serial_reference(frames, config)
        checked = 0
        for k in ("f0", "f0_strength", "formant_freqs", "formant_bws", "mfcc",
                  "rms", "status"):
            np.testing.assert_allclose(
                out[k][:real_files], serial[k], rtol=1e-5, atol=1e-5,
                err_msg=f"{k} @ mesh {files_axis}x{frames_axis}",
            )
            checked += 1
        print(
            f"dryrun topology ok: mesh={{'files': {files_axis}, 'frames': "
            f"{frames_axis}}} files={real_files}(+{files - real_files} pad) "
            f"F={F} features_checked={checked}"
        )

    # The approximate (halo) mode must compile + run on the widest mesh too.
    files_axis, frames_axis = max(topologies, key=lambda t: t[1])
    mesh = make_mesh(files_axis, frames_axis, jax.devices()[: files_axis * frames_axis])
    frames, config = dryrun_case(files_axis, frames_axis * 4 + 1)
    out2 = sharded_analyze(jnp.asarray(frames), config, mesh, overlap=2, exact=False)
    assert np.asarray(out2["f0"]).shape == frames.shape[:2]
    print(
        f"dryrun_multichip ok: {len(topologies)} topologies on {n_devices} "
        f"devices + halo mode on {files_axis}x{frames_axis}"
    )
