"""Multi-process distributed simulation on CPU devices.

Validates the process-boundary path of the data-parallel design (SURVEY.md
section 5.8) without TPU hardware: N processes x D CPU devices each join a
jax.distributed cluster, build ONE global mesh, assemble the global batch
from per-host slices (jax.make_array_from_process_local_data — the exact
mechanism runners use via parallel.mesh.shard_batch), and run fused attack
steps.  Worker 0 writes the resulting delta trajectory; the launcher
re-computes the same steps single-process on an N*D-device mesh and asserts
trajectory equality — the psum-over-DCN gradient must equal the
single-process psum to float tolerance.

Usage:
  python scripts/multihost_sim.py              # launcher: 2 procs x 4 devs
  python scripts/multihost_sim.py --processes 2 --devices-per-proc 4
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES, SIZE, CLASSES, STEPS = 8, 16, 5, 3


def _global_batch(total_batch):
    import numpy as np

    rng = np.random.default_rng(0)
    return {
        "video": rng.integers(
            0, 255, (total_batch, FRAMES, SIZE, SIZE, 3), dtype=np.uint8
        ),
        "labels": rng.integers(0, CLASSES, (total_batch,), dtype=np.int64),
    }


def _build_engine(mesh):
    import jax
    import jax.numpy as jnp

    from flickering_adversarial_video_tpu.attack import FlickerSpec
    from flickering_adversarial_video_tpu.engine import AttackConfig, AttackEngine
    from flickering_adversarial_video_tpu.models.i3d import InceptionI3D, init_i3d_params

    model = InceptionI3D(num_classes=CLASSES, compute_dtype=jnp.float32)
    variables = init_i3d_params(
        jax.random.key(0), num_classes=CLASSES, frames=FRAMES, size=SIZE
    )
    return AttackEngine(
        lambda v, x: model.apply(v, x)[0],
        variables,
        FlickerSpec(frames=FRAMES),
        AttackConfig(),
        mesh=mesh,
    )


def _run_steps(engine, local_batch):
    import jax
    import numpy as np

    from flickering_adversarial_video_tpu.engine import RuntimeFlags

    batch = engine.shard(local_batch)
    state = engine.init_state()
    flags = RuntimeFlags()
    key = jax.random.key(0)
    deltas = []
    for _ in range(STEPS):
        state, metrics = engine.train_step(state, batch, flags, key)
        deltas.append(np.asarray(jax.device_get(state.delta)))
    return np.stack(deltas)


def worker(args):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices_per_proc)

    from flickering_adversarial_video_tpu.parallel import (
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.processes,
        process_id=args.pid,
    )
    assert jax.process_count() == args.processes, jax.process_count()
    n_global = args.processes * args.devices_per_proc
    assert len(jax.devices()) == n_global, len(jax.devices())

    mesh = make_mesh()
    engine = _build_engine(mesh)
    total_batch = n_global
    per_host = total_batch // args.processes
    gb = _global_batch(total_batch)
    # this host's slice — same assignment rule as per-host tfrecord sharding
    lo = args.pid * per_host
    local = {k: v[lo : lo + per_host] for k, v in gb.items()}
    deltas = _run_steps(engine, local)
    if args.pid == 0:
        import numpy as np

        np.savez(args.out, deltas=deltas)
    # all processes must stay alive until the cluster is done
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")
    print(f"worker {args.pid} ok")


def launcher(args):
    import numpy as np

    # pick a free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    out = os.path.join(tempfile.mkdtemp(prefix="multihost_"), "deltas.npz")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(args.processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--role=worker",
                    f"--pid={pid}",
                    f"--processes={args.processes}",
                    f"--devices-per-proc={args.devices_per_proc}",
                    f"--coordinator={coordinator}",
                    f"--out={out}",
                ],
                env=env,
                cwd=REPO,
            )
        )
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        raise RuntimeError(f"worker exit codes: {rcs}")

    # single-process reference on the same total device count
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_num_cpu_devices", args.processes * args.devices_per_proc
    )
    from flickering_adversarial_video_tpu.parallel import make_mesh

    mesh = make_mesh()
    engine = _build_engine(mesh)
    gb = _global_batch(args.processes * args.devices_per_proc)
    ref = _run_steps(engine, gb)

    got = np.load(out)["deltas"]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    print(
        json.dumps(
            {
                "multihost_sim": "ok",
                "processes": args.processes,
                "devices_per_proc": args.devices_per_proc,
                "steps": STEPS,
                "max_abs_diff": float(np.max(np.abs(got - ref))),
            }
        )
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--role", choices=["launcher", "worker"], default="launcher")
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=4)
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--coordinator", default="")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)
    if args.role == "worker":
        worker(args)
    else:
        launcher(args)


if __name__ == "__main__":
    main()
