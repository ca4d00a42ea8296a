"""Simulated multi-process `jax.distributed` bring-up.

The environment has one TPU chip, so real multi-host execution cannot run
here — but the cross-process wiring must still be exercised. This tool
launches TWO local processes on the CPU backend (each with 2 virtual XLA
host devices), rendezvouses them through JAX's TCP coordinator, and drives
the REAL training path end-to-end in two phases:

Phase DP (VERDICT r2 #10) — pure data parallelism:
  1. `init_distributed(coordinator, 2, pid)` -> process_count()==2,
     4 global devices, 2 addressable per process;
  2. `build_mesh` over the global devices (4x1 data mesh spanning both
     processes);
  3. each process feeds ONLY its local half of the global batch through
     `host_local_batch` (jax.make_array_from_process_local_data);
  4. one jitted DeepFM train step (the Trainer's own `_train_step`)
     executes collectives across the process boundary;
  5. both processes' replicated-params digests are asserted identical.

Phase MP (VERDICT r3 #6) — cross-process MODEL parallelism + resume:
  1. 2x2 (data x model) mesh over the same 2 processes; DeepFM's
     30,002-row user table ROW-SHARDED over the model axis (the
     Redis-as-parameter-server analogue, SURVEY.md §2.7) — asserted from
     the live sharding spec;
  2. a 2-step training trajectory runs uninterrupted, then again with a
     full train-state checkpoint SAVED after step 1 (params + Adam
     moments gathered off the mesh via an XLA replicate, written by
     process 0) and RESTORED by both processes (re-sharded onto the
     mesh) before step 2 — final params asserted BITWISE equal;
  3. the parent runs the identical trajectory single-device and asserts
     the sharded cross-process result matches it (max|dparam| < 1e-3,
     the dryrun tolerance).

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
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2

# Phase-MP fixture: vocabs padded to the model-axis width (30001/1001 are
# indivisible by 2 — same convention as __graft_entry__.dryrun_multichip).
MP_USER_BUCKETS, MP_MOVIE_BUCKETS = 30002, 1002
MP_BATCH = 64
MP_STEPS = 2


def _force_cpu():
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon (env vars can't override);
    # config-update is the supported escape hatch. Two processes probing
    # the real TPU would deadlock behind each other — CPU only here.
    jax.config.update("jax_platforms", "cpu")
    return jax


def _mp_fixture(trainer_plan):
    """(trainer, feats_batches, labels_batches): the deterministic 2-step
    trajectory shared by the sharded workers and the single-device
    reference — same seeds, same batch schedule, no shuffle."""
    import numpy as np

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    model = build_model(
        "deepfm", user_buckets=MP_USER_BUCKETS, movie_buckets=MP_MOVIE_BUCKETS
    )
    ds = synthetic_ctr_dataset(
        MP_BATCH * MP_STEPS, user_vocab=MP_USER_BUCKETS,
        movie_vocab=MP_MOVIE_BUCKETS, seed=11,
    )
    trainer = Trainer(
        model, TrainConfig(batch_size=MP_BATCH, epochs=1, seed=7),
        plan=trainer_plan,
    )
    trainer._build_steps()
    batches = []
    for s in range(MP_STEPS):
        lo, hi = s * MP_BATCH, (s + 1) * MP_BATCH
        feats = {k: v[lo:hi] for k, v in ds.features.items()}
        labels = ds.labels[lo:hi]
        batches.append((feats, labels, np.ones(MP_BATCH, np.float32)))
    return trainer, ds, batches


def worker_dp(coordinator: str, pid: int) -> None:
    jax = _force_cpu()

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


def worker_mp(coordinator: str, pid: int, state_root: str) -> None:
    """Phase MP: 2x2 mesh, row-sharded user table, cross-process
    save/resume, bitwise continuation."""
    import hashlib

    jax = _force_cpu()
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparrowrecsys_tpu.config import MeshConfig
    from sparrowrecsys_tpu.ops import metrics as M
    from sparrowrecsys_tpu.parallel.mesh import build_mesh
    from sparrowrecsys_tpu.parallel.scaling import (
        host_local_batch, init_distributed,
    )
    from sparrowrecsys_tpu.training import checkpoint as ckpt

    init_distributed(coordinator, NUM_PROCESSES, pid)
    plan = build_mesh(
        MeshConfig(data_parallel=2, model_parallel=2)
    )  # 2x2 spanning both processes (each owns one data row)
    trainer, ds, batches = _mp_fixture(plan)

    # The 30,002-row user table must actually be ROW-SHARDED over the
    # model axis (default min_rows=4096: user table shards, movie tables
    # replicate — the big-table-as-parameter-server configuration).
    def init_state():
        params = trainer.init_params(ds.features)
        spec = params["emb_userId"]["table"].sharding.spec
        assert tuple(spec) == (plan.model_axis, None), spec
        return params, trainer.tx.init(params)

    # Replicate-off-mesh gather: one XLA all-gather program (P() output
    # sharding), then host reads — the orbax-style gather-to-host path.
    replicated = NamedSharding(plan.mesh, P())

    def gather(tree):
        rep = jax.jit(lambda t: t, out_shardings=replicated)(tree)
        return jax.tree_util.tree_map(lambda x: np.asarray(x), rep)

    def place_batch(feats, labels, mask):
        per = MP_BATCH // 2
        lo, hi = pid * per, (pid + 1) * per
        gb = host_local_batch(
            {**{k: v[lo:hi] for k, v in feats.items()},
             "__labels__": labels[lo:hi], "__mask__": mask[lo:hi]}, plan
        )
        return gb, gb.pop("__labels__"), gb.pop("__mask__")

    def run(params, opt_state, step_batches):
        for feats, labels, mask in step_batches:
            gb, gl, gm = place_batch(feats, labels, mask)
            params, opt_state, _ = trainer._train_step(
                params, opt_state, M.init_metrics(), gb, gl, gm
            )
        return params, opt_state

    from sparrowrecsys_tpu.parallel.mesh import shard_params

    def reshard_state(params_np, opt_np):
        """Host pytrees -> mesh placement: params through the standard
        rules, optimizer moments onto their params' own shardings (a
        fresh tx.init supplies the placed template; scalar leaves optax
        creates fresh — count — come out uncommitted, replicate those)."""
        params = shard_params(params_np, plan)
        opt_template = trainer.tx.init(params)
        opt_state = jax.tree_util.tree_map(
            lambda v, t: jax.device_put(
                np.asarray(v),
                t.sharding
                if isinstance(t.sharding, NamedSharding)
                else replicated,
            ),
            opt_np, opt_template,
        )
        return params, opt_state

    # Both trajectories pass state through the SAME gather->reshard hop
    # between steps, so the only delta under test in trajectory 2 is the
    # checkpoint FILE round trip — which must add nothing (bitwise). (A
    # live jit-output -> next-step chain compiles against the compiler's
    # own output placements and differs from any re-placed continuation
    # at f32-reassociation scale, ~1e-7 — measured; the single-device
    # parity check below bounds that separately.)

    # --- trajectory 1: state through host memory, no files --------------
    params, opt_state = init_state()
    params, opt_state = run(params, opt_state, batches[:1])
    params, opt_state = reshard_state(gather(params), gather(opt_state))
    params, opt_state = run(params, opt_state, batches[1:])
    full_unint = gather(params)

    # --- trajectory 2: state through save_train_state on disk -----------
    params, opt_state = init_state()
    params, opt_state = run(params, opt_state, batches[:1])
    params_np = gather(params)
    opt_np = gather(opt_state)
    state_dir = os.path.join(state_root, "mp_state")
    if pid == 0:
        ckpt.save_train_state(params_np, opt_np, 1, state_dir)
    multihost_utils.sync_global_devices("mp_ckpt_written")
    loaded_p, loaded_o, next_epoch, _ = ckpt.load_latest_train_state(
        state_dir, params_np, opt_np
    )
    assert next_epoch == 1
    params, opt_state = reshard_state(loaded_p, loaded_o)
    params, opt_state = run(params, opt_state, batches[1:])
    full_resumed = gather(params)

    bitwise = all(
        np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(full_unint),
            jax.tree_util.tree_leaves(full_resumed),
        )
    )
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(full_unint):
        h.update(np.ascontiguousarray(leaf).tobytes())
    if pid == 0:  # final params for the parent's single-device comparison
        np.savez(
            os.path.join(state_root, "mp_final.npz"),
            **{f"p{i}": l for i, l in
               enumerate(jax.tree_util.tree_leaves(full_unint))},
        )
    print(
        f"MPWORKER {pid} sharded_user_table=True resume_bitwise={bitwise} "
        f"sha={h.hexdigest()[:16]}",
        flush=True,
    )
    assert bitwise, "resumed trajectory diverged from uninterrupted run"


def single_reference(out_path: str) -> None:
    """The phase-MP trajectory on ONE device (no mesh) — the parity
    reference the sharded cross-process result must match."""
    jax = _force_cpu()
    import numpy as np

    from sparrowrecsys_tpu.ops import metrics as M

    trainer, ds, batches = _mp_fixture(None)
    params = trainer.init_params(ds.features)
    opt_state = trainer.tx.init(params)
    for feats, labels, mask in batches:
        fd = {k: np.asarray(v) for k, v in feats.items()}
        params, opt_state, _ = trainer._train_step(
            params, opt_state, M.init_metrics(), fd, labels, mask
        )
    np.savez(
        out_path,
        **{f"p{i}": np.asarray(l)
           for i, l in enumerate(jax.tree_util.tree_leaves(params))},
    )
    print("SINGLE reference written", flush=True)


def _launch_workers(phase: str, coord: str, extra: list) -> list:
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count="
        f"{DEVICES_PER_PROCESS}",
    )
    return [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--phase", phase, "--process-id", str(i),
             "--coordinator", coord] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(NUM_PROCESSES)
    ]


def _free_port() -> str:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return f"localhost:{s.getsockname()[1]}"


def main() -> None:
    if "--worker" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]
        pid = int(sys.argv[sys.argv.index("--process-id") + 1])
        coord = sys.argv[sys.argv.index("--coordinator") + 1]
        if phase == "dp":
            worker_dp(coord, pid)
        else:
            root = sys.argv[sys.argv.index("--state-root") + 1]
            worker_mp(coord, pid, root)
        return
    if "--single-reference" in sys.argv:
        single_reference(sys.argv[sys.argv.index("--single-reference") + 1])
        return

    # --- phase DP --------------------------------------------------------
    procs = _launch_workers("dp", _free_port(), [])
    outs = [p.communicate(timeout=600)[0] for p in procs]
    digests = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        print(f"--- dp worker {i} (rc={p.returncode}) ---\n{out}")
        if p.returncode != 0:
            print("BRINGUP FAILED")
            sys.exit(1)
        line = [l for l in out.splitlines() if l.startswith(f"WORKER {i}")]
        digests.append(line[0].split()[2])
    if len(set(digests)) != 1:
        print(f"BRINGUP FAILED: divergent params {digests}")
        sys.exit(1)
    print(f"DP BRINGUP OK: 2 processes x {DEVICES_PER_PROCESS} devices, "
          f"replicated params agree ({digests[0]})")

    # --- phase MP: 2x2 mesh + row-sharded table + save/resume -----------
    with tempfile.TemporaryDirectory() as root:
        procs = _launch_workers("mp", _free_port(), ["--state-root", root])
        outs = [p.communicate(timeout=600)[0] for p in procs]
        shas = []
        for i, (p, out) in enumerate(zip(procs, outs)):
            print(f"--- mp worker {i} (rc={p.returncode}) ---\n{out}")
            if p.returncode != 0:
                print("BRINGUP FAILED (mp)")
                sys.exit(1)
            line = [l for l in out.splitlines()
                    if l.startswith(f"MPWORKER {i}")][0]
            assert "resume_bitwise=True" in line, line
            shas.append(line.split("sha=")[1])
        if len(set(shas)) != 1:
            print(f"BRINGUP FAILED: divergent mp params {shas}")
            sys.exit(1)

        # Single-device parity reference (own process: the parent must not
        # initialize JAX itself — it may be running under a TPU-attached
        # session).
        import numpy as np

        ref_path = os.path.join(root, "single.npz")
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--single-reference", ref_path],
            env=env, capture_output=True, text=True, timeout=600,
        )
        if rc.returncode != 0:
            print(rc.stdout + rc.stderr)
            print("BRINGUP FAILED (single reference)")
            sys.exit(1)
        ref = np.load(ref_path)
        got = np.load(os.path.join(root, "mp_final.npz"))
        assert set(ref.files) == set(got.files)
        worst = max(
            float(np.max(np.abs(ref[k] - got[k]))) for k in ref.files
        )
        if not worst < 1e-3:
            print(f"BRINGUP FAILED: sharded != single-device (max {worst})")
            sys.exit(1)
        print(
            "MP BRINGUP OK: 2x2 data x model mesh over 2 processes, user "
            "table row-sharded, save/resume across the process boundary "
            f"bitwise, parity vs single-device max|dparam|={worst:.2e}"
        )
    print("BRINGUP OK")


if __name__ == "__main__":
    main()
