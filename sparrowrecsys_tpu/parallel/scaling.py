"""Multi-host initialization + scaling-efficiency harness.

BASELINE.md target: >= 80% scaling efficiency on 2+ hosts with row-sharded
embedding tables. `measure_scaling` runs the jitted DeepFM train step on
1..N-device meshes (real chips or `--xla_force_host_platform_device_count`
virtual devices) with the global batch scaled proportionally, and reports
throughput + efficiency vs the 1-device run. `init_distributed` wraps
`jax.distributed.initialize` for real multi-host launches; batches are
placed with `jax.make_array_from_process_local_data` so each host feeds
only its shard (no cross-host host-side traffic).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional



def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (no-op on a single process). Mirrors the
    SURVEY.md §2.7 TPU-native equivalent of the reference's absent
    cross-process story."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_local_batch(global_batch: dict, plan) -> dict:
    """Place per-host numpy shards as one global sharded array
    (jax.make_array_from_process_local_data over the data axis)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(plan.mesh, P(plan.data_axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in global_batch.items()
    }


@dataclasses.dataclass
class ScalingPoint:
    n_devices: int
    examples_per_sec: float
    efficiency: float


def measure_scaling(
    device_counts: List[int],
    per_device_batch: int = 4096,
    steps: int = 30,
    model_parallel: int = 1,
    user_vocab: int = 30001,
    movie_vocab: int = 1001,
) -> List[ScalingPoint]:
    import jax

    from sparrowrecsys_tpu.config import MeshConfig, TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.ops import metrics as M
    from sparrowrecsys_tpu.parallel.mesh import build_mesh
    from sparrowrecsys_tpu.training.loop import Trainer

    results: List[ScalingPoint] = []
    base = None
    for n in device_counts:
        devices = jax.devices()[:n]
        if len(devices) < n:
            break
        mp = model_parallel if n % max(model_parallel, 1) == 0 else 1
        plan = build_mesh(
            MeshConfig(data_parallel=n // mp, model_parallel=mp), devices=devices
        )
        batch = per_device_batch * (n // mp)
        uv = ((user_vocab + mp - 1) // mp) * mp
        mv = ((movie_vocab + mp - 1) // mp) * mp
        model = build_model("deepfm", user_buckets=uv, movie_buckets=mv)
        ds = synthetic_ctr_dataset(batch * 2, user_vocab=uv, movie_vocab=mv)
        trainer = Trainer(model, TrainConfig(batch_size=batch, epochs=1), plan=plan)
        trainer._build_steps()
        params = trainer.init_params(ds.features)
        opt_state = trainer.tx.init(params)
        mstate = M.init_metrics()
        batches = list(trainer._batches(ds, batch, False, 0))[:1]
        f, l, m = batches[0]
        from sparrowrecsys_tpu.training.loop import hard_sync

        for _ in range(3):  # warmup/compile
            params, opt_state, mstate = trainer._train_step(
                params, opt_state, mstate, f, l, m
            )
        # hard_sync, not block_until_ready: the latter returns early on the
        # axon remote backend (CLAUDE.md) and would record dispatch pace.
        hard_sync(params)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, mstate = trainer._train_step(
                params, opt_state, mstate, f, l, m
            )
        hard_sync(params)
        dt = time.perf_counter() - t0
        eps = batch * steps / dt
        per_dev = eps / n
        if base is None:
            base = per_dev
        results.append(ScalingPoint(n, eps, per_dev / base))
    return results
