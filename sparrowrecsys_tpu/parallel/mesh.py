"""Device mesh construction and parameter/batch sharding rules.

The reference has no parallelism of its own (SURVEY.md §2.7: single-process
Keras `fit`, `master=local` Spark, Redis as the de-facto parameter server).
The TPU-native design scales on a 2-D mesh:

- `data` axis: batch (data-parallel) — gradients all-reduce over ICI.
- `model` axis: embedding-table rows (the only parameters that grow with
  vocabulary size; at MovieLens-20M+ scale the user table dominates).

Sharding rules are name-based: any parameter whose path ends in
`emb_*/table` with enough rows is row-sharded over `model`; everything
else (dense towers, biases — KBs in total) is replicated. XLA inserts the
all-gathers for sharded lookups; `ops.embedding.sharded_lookup` exists for
the explicit shard_map/psum formulation where manual control wins.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparrowrecsys_tpu.config import MeshConfig


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh
    data_axis: str = "data"
    model_axis: str = "model"

    @property
    def n_data(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def n_model(self) -> int:
        return self.mesh.shape[self.model_axis]


def build_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshPlan:
    """Build a (data, model) mesh over available devices.

    data_parallel=-1 infers data size as n_devices / model_parallel.
    A single device yields a 1x1 mesh — all sharding rules degrade to
    no-ops, so the same jitted step runs everywhere.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, config.model_parallel)
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(f"mesh {dp}x{mp} != {n} devices")
    arr = np.array(devices).reshape(dp, mp)
    mesh = Mesh(arr, (config.data_axis, config.model_axis))
    return MeshPlan(mesh, config.data_axis, config.model_axis)


#: Row-shard embedding tables at/above this many rows; below it the
#: all-gather costs more than the replicated copy (MovieLens tables are
#: ~1.2 MB — sharding them is mechanism demonstration, not a win).
MIN_ROWS_TO_SHARD = 4096


def _spec_for(path: tuple, value: Any, plan: MeshPlan, min_rows: int) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    if (
        keys
        and keys[-1] in ("table", "w")
        and hasattr(value, "ndim")
        and value.ndim == 2
        and value.shape[0] >= min_rows
        and value.shape[0] % plan.n_model == 0
    ):
        return P(plan.model_axis, None)
    return P()


def param_shardings(
    params: Any, plan: MeshPlan, min_rows: int = MIN_ROWS_TO_SHARD
) -> Any:
    """Pytree of NamedShardings mirroring `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(plan.mesh, _spec_for(path, v, plan, min_rows)),
        params,
    )


def shard_params(params: Any, plan: MeshPlan, min_rows: int = MIN_ROWS_TO_SHARD) -> Any:
    return jax.device_put(params, param_shardings(params, plan, min_rows))


def batch_sharding(plan: MeshPlan) -> NamedSharding:
    return NamedSharding(plan.mesh, P(plan.data_axis))


def shard_batch(batch: Any, plan: MeshPlan) -> Any:
    """Place a pytree of [B, ...] arrays sharded over the data axis."""
    s = batch_sharding(plan)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
