"""Simulated multi-process `jax.distributed` bring-up (VERDICT r2 #10).

The environment has one TPU chip, so real multi-host execution cannot run
here — but `init_distributed` + `host_local_batch` (parallel/scaling.py)
had never executed with `num_processes > 1` at all. This tool launches
TWO local processes on the CPU backend (each with 2 virtual XLA host
devices), rendezvouses them through JAX's TCP coordinator, and drives the
REAL training path end-to-end:

  1. `init_distributed(coordinator, 2, pid)` -> process_count()==2,
     4 global devices, 2 addressable per process;
  2. `build_mesh` over the global devices (4x1 data mesh spanning both
     processes);
  3. each process feeds ONLY its local half of the global batch through
     `host_local_batch` (jax.make_array_from_process_local_data);
  4. one jitted DeepFM train step (the Trainer's own `_train_step`,
     sharded by the MeshPlan) executes collectives across the process
     boundary;
  5. both processes print a digest of the (replicated) updated params —
     the parent asserts the digests are identical, i.e. the cross-process
     all-reduce really synchronized the model.

SURVEY.md §2.7: the reference's cross-process story is Spark shuffles +
REST to TF Serving (`RecForYouProcess.java:139`); this is the TPU-native
equivalent's wiring check. Run: `python tools/dist_bringup.py` (parent);
exit 0 + "BRINGUP OK" is the pass signal. tests/test_parallel.py runs it.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2


def worker(coordinator: str, pid: int) -> None:
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon (env vars can't override);
    # config-update is the supported escape hatch. Two processes probing
    # the real TPU would deadlock behind each other — CPU only here.
    jax.config.update("jax_platforms", "cpu")

    from sparrowrecsys_tpu.config import MeshConfig, TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.ops import metrics as M
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.parallel.mesh import build_mesh
    from sparrowrecsys_tpu.parallel.scaling import (
        host_local_batch, init_distributed,
    )
    from sparrowrecsys_tpu.training.loop import Trainer

    init_distributed(coordinator, NUM_PROCESSES, pid)
    assert jax.process_count() == NUM_PROCESSES, jax.process_count()
    n_global = NUM_PROCESSES * DEVICES_PER_PROCESS
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == DEVICES_PER_PROCESS

    plan = build_mesh(MeshConfig(data_parallel=n_global))
    batch = 64
    trainer = Trainer(
        build_model("deepfm"), TrainConfig(batch_size=batch, epochs=1),
        plan=plan,
    )
    trainer._build_steps()

    # Deterministic global batch; THIS process materializes only the rows
    # its addressable devices own (contiguous over the data axis).
    ds = synthetic_ctr_dataset(batch, seed=11)
    per_proc = batch // NUM_PROCESSES
    lo, hi = pid * per_proc, (pid + 1) * per_proc
    local_feats = {k: v[lo:hi] for k, v in ds.features.items()}
    local_labels = ds.labels[lo:hi]

    params = trainer.init_params(ds.features)
    opt_state = trainer.tx.init(params)
    import numpy as np

    global_batch = host_local_batch(
        {**local_feats, "__labels__": local_labels,
         "__mask__": np.ones(per_proc, np.float32)}, plan
    )
    labels = global_batch.pop("__labels__")
    mask = global_batch.pop("__mask__")
    params, opt_state, mstate = trainer._train_step(
        params, opt_state, mstate := M.init_metrics(),
        global_batch, labels, mask,
    )
    # Params come out replicated; every process can read them whole. If the
    # cross-process psum didn't run (or ran over different data), the
    # digests diverge.
    leaves = jax.tree_util.tree_leaves(params)
    digest = float(sum(np.abs(np.asarray(x)).sum() for x in leaves))
    loss = float(np.asarray(M.finalize_metrics(mstate)["loss"]))
    assert np.isfinite(digest) and np.isfinite(loss)
    print(f"WORKER {pid} digest={digest:.6f} loss={loss:.6f}", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--process-id") + 1])
        coord = sys.argv[sys.argv.index("--coordinator") + 1]
        worker(coord, pid)
        return

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count="
        f"{DEVICES_PER_PROCESS}",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(i), "--coordinator", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NUM_PROCESSES)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    digests = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        print(f"--- worker {i} (rc={p.returncode}) ---\n{out}")
        if p.returncode != 0:
            print("BRINGUP FAILED")
            sys.exit(1)
        line = [l for l in out.splitlines() if l.startswith(f"WORKER {i}")]
        digests.append(line[0].split()[2])
    if len(set(digests)) != 1:
        print(f"BRINGUP FAILED: divergent params {digests}")
        sys.exit(1)
    print(f"BRINGUP OK: 2 processes x {DEVICES_PER_PROCESS} devices, "
          f"replicated params agree ({digests[0]})")


if __name__ == "__main__":
    main()
