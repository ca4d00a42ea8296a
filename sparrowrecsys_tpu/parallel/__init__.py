"""Device mesh, shardings, and multi-host utilities."""

from sparrowrecsys_tpu.parallel.mesh import (
    MeshPlan,
    build_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
    shard_params,
)
