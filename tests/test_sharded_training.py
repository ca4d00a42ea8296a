"""Numerical equivalence: sharded training == single-device training.

The strongest evidence the parallel plane is correct: the same DeepFM
training run, once on a 1x1 mesh and once on a 4x2 (data x model) mesh
with row-sharded embedding tables, must produce the same losses and the
same final parameters (up to float addition-order noise).
"""

import jax
import numpy as np
import pytest

from sparrowrecsys_tpu.config import MeshConfig, TrainConfig
from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.parallel.mesh import build_mesh
from sparrowrecsys_tpu.training.loop import Trainer

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _run(plan, user_buckets, movie_buckets, min_rows_to_shard=None,
         model_name="deepfm"):
    model = build_model(
        model_name, user_buckets=user_buckets, movie_buckets=movie_buckets
    )
    ds = synthetic_ctr_dataset(
        512, user_vocab=user_buckets, movie_vocab=movie_buckets, seed=3
    )
    loss_fn = None
    if model_name == "dien":
        from sparrowrecsys_tpu.data.negatives import add_dien_negatives
        from sparrowrecsys_tpu.models.dien import dien_loss_fn

        ds = add_dien_negatives(ds, seed=2020, vocab=movie_buckets)
        loss_fn = dien_loss_fn()
    cfg = TrainConfig(batch_size=128, epochs=2, shuffle_each_epoch=True, seed=11)
    trainer = Trainer(model, cfg, plan=plan, loss_fn=loss_fn)
    if min_rows_to_shard is not None and plan is not None:
        import sparrowrecsys_tpu.parallel.mesh as mesh_mod

        # Shard even the small test tables.
        orig = trainer.init_params

        def init(sample_feats, seed=None):
            params = model.init(
                jax.random.PRNGKey(cfg.seed),
                {k: np.asarray(v[:2]) for k, v in sample_feats.items()},
            )["params"]
            from sparrowrecsys_tpu.parallel.mesh import shard_params

            return shard_params(params, plan, min_rows=min_rows_to_shard)

        trainer.init_params = init
    res = trainer.fit(ds, verbose=False)
    return res


@needs8
def test_sharded_matches_single_device():
    user_buckets, movie_buckets = 30002, 1002  # divisible by model axis 2
    single = _run(None, user_buckets, movie_buckets)
    plan = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    sharded = _run(plan, user_buckets, movie_buckets, min_rows_to_shard=16)

    for a, b in zip(single.history, sharded.history):
        assert abs(a["loss"] - b["loss"]) < 1e-3, (a, b)
        assert abs(a["roc_auc"] - b["roc_auc"]) < 5e-3, (a, b)

    la = jax.tree_util.tree_leaves(single.params)
    lb = jax.tree_util.tree_leaves(sharded.params)
    worst = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(la, lb)
    )
    assert worst < 1e-3, worst


@needs8
@pytest.mark.parametrize("model_name", ["din", "dien"])
def test_sequence_models_sharded_match_single_device(model_name):
    """The recurrent/attention models under the same 4x2 mesh: history
    gathers, DIN attention, DIEN's GRU+AUGRU scans and two-headed aux
    loss must all survive data sharding + row-sharded tables."""
    user_buckets, movie_buckets = 30002, 1002
    single = _run(None, user_buckets, movie_buckets, model_name=model_name)
    plan = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    sharded = _run(
        plan, user_buckets, movie_buckets, min_rows_to_shard=16,
        model_name=model_name,
    )
    for a, b in zip(single.history, sharded.history):
        assert abs(a["loss"] - b["loss"]) < 2e-3, (a, b)
        assert abs(a["roc_auc"] - b["roc_auc"]) < 5e-3, (a, b)
    la = jax.tree_util.tree_leaves(single.params)
    lb = jax.tree_util.tree_leaves(sharded.params)
    worst = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(la, lb)
    )
    assert worst < 1e-3, worst
