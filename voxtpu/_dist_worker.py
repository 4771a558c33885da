"""Multi-process dryrun worker: one rank of a real `jax.distributed` cluster.

Launched by `voxtpu.dist.launch_multiprocess_dryrun` (never imported into a
jax-initialized process — platform and device count must be fixed before the
first backend touch). Each rank:

1. joins the cluster (`init_distributed` with num_processes > 1 — the code
   path SURVEY C29 requires and single-process runs can never exercise),
2. builds the ("files", "frames") mesh over ALL global devices, with the
   files axis laid out process-major so each recording's frames stay on one
   process's devices and only input scatter / feature gather cross the
   process boundary (the DCN/ICI split of the deployment design, dist.py
   module docstring),
3. constructs the globally-sharded input from process-local data via
   `jax.make_array_from_callback` (each rank materializes only its own
   shards),
4. runs the full `sharded_analyze` pipeline (pitch + Viterbi + formants with
   the exact cross-shard carry + MFCC + RMS), and
5. asserts every locally-addressable output shard matches a serial
   `analyze_frames` reference computed on this rank alone.

The reference has no distributed anything (SURVEY C28/C29); this file is the
proof that voxtpu's multi-host design actually executes, not just compiles.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    args = ap.parse_args()

    import jax

    # Must precede backend init: the axon sitecustomize force-selects the TPU
    # platform otherwise (see scripts/cpu_env.py), and gloo is the CPU
    # backend's cross-process collectives transport.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from voxtpu.dist import dryrun_case, init_distributed, make_mesh, sharded_analyze

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_global = args.num_processes * args.local_devices
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == args.local_devices, jax.local_device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # files axis == process axis (jax.devices() is process-major), frames axis
    # == each process's local devices: per-file work is process-local, the
    # exact formant carry and the Viterbi gather cross processes over gloo.
    files_axis = args.num_processes
    frames_axis = args.local_devices
    mesh = make_mesh(files_axis, frames_axis)

    per_shard = 2
    F = frames_axis * per_shard
    files = 2 * files_axis  # files_local=2: per-file carry isolation, globally
    frames, config = dryrun_case(files, F)

    sharding = NamedSharding(mesh, P("files", "frames", None))
    garr = jax.make_array_from_callback(
        frames.shape, sharding, lambda idx: frames[idx]
    )

    out = sharded_analyze(garr, config, mesh, exact=True)

    # Serial reference, computed wholly on this rank's local device 0 —
    # independent of the cluster, so agreement proves the process-spanning
    # path end-to-end (scatter, sharded kernels, cross-process carry, gather).
    from voxtpu.pipeline import analyze_frames

    serial = {}
    for i in range(files):
        s = analyze_frames(jnp.asarray(frames[i]), config)
        for k, v in s.items():
            serial.setdefault(k, []).append(np.asarray(v))
    serial = {k: np.stack(v) for k, v in serial.items()}

    checked = 0
    for k in ("f0", "f0_strength", "formant_freqs", "formant_bws", "mfcc",
              "rms", "status"):
        for shard in out[k].addressable_shards:
            np.testing.assert_allclose(
                np.asarray(shard.data), serial[k][shard.index],
                rtol=1e-5, atol=1e-5,
                err_msg=f"{k} shard {shard.index} (rank {args.process_id})",
            )
            checked += 1
    assert checked > 0

    print(
        f"multiprocess dryrun ok: rank={args.process_id}/{args.num_processes} "
        f"mesh={dict(mesh.shape)} global_devices={jax.device_count()} "
        f"local_devices={jax.local_device_count()} shards_checked={checked}",
        flush=True,
    )


if __name__ == "__main__":
    main()
