"""Row-sparse (lazy) Adam for big embedding tables (training/row_optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparrowrecsys_tpu.training.row_optim import (
    RowAdamState,
    fused_row_adam_update,
    fused_table,
    init_fused_row_adam,
    init_row_adam,
    row_adam_update,
)


def _dense_adam_step(table, mu, nu, grad, count, lr=1e-3, b1=0.9, b2=0.999,
                     eps=1e-7):
    mu = b1 * mu + (1 - b1) * grad
    nu = b2 * nu + (1 - b2) * grad * grad
    c1 = 1 - b1 ** count
    c2 = 1 - b2 ** count
    upd = -lr * (mu / c1) / (jnp.sqrt(nu / c2) + eps)
    return table + upd, mu, nu


def test_all_rows_touched_matches_dense_adam():
    """When every row is touched every step, lazy == dense Adam."""
    rng = np.random.default_rng(0)
    v, d = 16, 8
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    state = init_row_adam(table)
    dt, dmu, dnu = table, jnp.zeros_like(table), jnp.zeros_like(table)
    ids = jnp.arange(v, dtype=jnp.int32)
    for step in range(1, 4):
        grad = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
        table, state = row_adam_update(
            table, state, grad, ids, learning_rate=1e-3
        )
        dt, dmu, dnu = _dense_adam_step(dt, dmu, dnu, grad, step)
        np.testing.assert_allclose(np.asarray(table), np.asarray(dt),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(state.mu), np.asarray(dmu),
                                   rtol=1e-6)


def test_untouched_rows_bitwise_frozen():
    rng = np.random.default_rng(1)
    v, d = 32, 4
    table0 = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    state = init_row_adam(table0)
    # Pre-load nonzero moments so freezing (not zeroing) is observable.
    state = RowAdamState(
        count=state.count,
        mu=jnp.asarray(rng.normal(size=(v, d)).astype(np.float32)),
        nu=jnp.asarray(rng.random(size=(v, d)).astype(np.float32)),
    )
    grad = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray([3, 7, 7, 11], jnp.int32)  # duplicates included
    table, new_state = row_adam_update(
        table0, state, grad, ids, learning_rate=1e-2
    )
    touched = np.zeros(v, bool)
    touched[[3, 7, 11]] = True
    np.testing.assert_array_equal(
        np.asarray(table)[~touched], np.asarray(table0)[~touched]
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.mu)[~touched], np.asarray(state.mu)[~touched]
    )
    assert not np.allclose(np.asarray(table)[touched],
                           np.asarray(table0)[touched])


def test_duplicates_collapse_and_out_of_range_ignored():
    """Duplicate ids apply ONE update (the dense grad already accumulated
    them); out-of-range ids are dropped; clamp-row (v-1) updates are not
    clobbered by fill slots."""
    v, d = 8, 2
    table = jnp.zeros((v, d), jnp.float32)
    grad = jnp.ones((v, d), jnp.float32)
    state = init_row_adam(table)
    ids = jnp.asarray([7, 7, 7, 2, 100, -5], jnp.int32)  # v-1 duplicated
    t1, s1 = row_adam_update(table, state, grad, ids, learning_rate=1e-3)
    got = np.asarray(t1)
    # rows 2 and 7 updated once each, identically (same grad value).
    assert got[2, 0] == got[7, 0] != 0.0
    untouched = [0, 1, 3, 4, 5, 6]
    np.testing.assert_array_equal(got[untouched], 0.0)  # incl. row v-5:
    # negative ids are routed to the drop slot, never wrapped.


def test_fused_layout_bitwise_matches_three_scatter():
    """fused_row_adam_update (one [U,3D] gather+scatter) is bit-identical
    to row_adam_update (3 scatters) over multiple steps, including
    duplicate, negative and oversized ids."""
    rng = np.random.default_rng(7)
    v, d = 32, 4
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    st3 = init_row_adam(table)
    stf = init_fused_row_adam(table)
    t3 = table
    ids_steps = [
        jnp.asarray([3, 7, 7, 11, -2, 100], jnp.int32),
        jnp.asarray([0, 31, 31, 31, 5, 5], jnp.int32),
        jnp.asarray([12, 13, 14, 15, 16, 17], jnp.int32),
    ]
    for ids in ids_steps:
        grad = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
        t3, st3 = row_adam_update(t3, st3, grad, ids, learning_rate=1e-2)
        stf = fused_row_adam_update(stf, grad, ids, learning_rate=1e-2)
        np.testing.assert_array_equal(np.asarray(t3),
                                      np.asarray(fused_table(stf)))
        np.testing.assert_array_equal(np.asarray(st3.mu),
                                      np.asarray(stf.buf[:, d:2 * d]))
        np.testing.assert_array_equal(np.asarray(st3.nu),
                                      np.asarray(stf.buf[:, 2 * d:]))


def test_scatter_index_hints_are_true():
    """The indices handed to the hinted scatters are genuinely sorted and
    distinct (ADVICE r4: unique's fill tail used to repeat v, and
    oversized ids landed unsorted — formally UB under the hints)."""
    from sparrowrecsys_tpu.training.row_optim import _touched_rows

    v = 8
    ids = jnp.asarray([7, 7, 7, 2, 100, -5, 3, 3], jnp.int32)
    uids, safe = _touched_rows(ids, v)
    u = np.asarray(uids)
    assert (np.diff(u) > 0).all(), u          # strictly increasing
    assert len(np.unique(u)) == len(u)        # distinct
    # drop slots (fill + OOB-mapped) are all >= v -> mode="drop" discards
    assert set(u[u < v].tolist()) == {2, 3, 7}
    s = np.asarray(safe)
    assert (np.diff(s) >= 0).all() and s.max() <= v - 1


def test_trainer_integration_sparse_user_table():
    """Trainer(sparse_tables=...) trains end-to-end on both data paths,
    deterministically, and the combined opt state checkpoints/resumes."""
    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    ds = synthetic_ctr_dataset(512, seed=4)

    def run():
        tr = Trainer(
            build_model("embedding_mlp"),
            TrainConfig(batch_size=128, epochs=2, seed=1),
            sparse_tables={"emb_userId": ("userId",),
                           "emb_movieId": ("movieId",)},
        )
        return tr.fit(ds, verbose=False)

    r1 = run()
    assert np.isfinite(r1.history[-1]["loss"])
    r2 = run()
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The model actually learned (params moved from init).
    tr = Trainer(build_model("embedding_mlp"),
                 TrainConfig(batch_size=128, epochs=2, seed=1),
                 sparse_tables={"emb_userId": ("userId",)})
    p0 = tr.init_params(ds.features)
    assert not np.allclose(
        np.asarray(r1.params["emb_userId"]["table"]),
        np.asarray(p0["emb_userId"]["table"]),
    )


def test_trainer_sparse_checkpoint_resume(tmp_path):
    """Full train-state resume is bitwise with the combined opt state."""
    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    ds = synthetic_ctr_dataset(256, seed=9)
    kw = dict(sparse_tables={"emb_userId": ("userId",)})
    cfg = TrainConfig(batch_size=64, epochs=3, seed=2)

    full = Trainer(build_model("embedding_mlp"), cfg, **kw).fit(
        ds, verbose=False
    )
    sd = str(tmp_path / "state")
    tr = Trainer(build_model("embedding_mlp"), cfg, **kw)
    tr.fit(ds, epochs=2, verbose=False, state_dir=sd, checkpoint_every=1)
    resumed = Trainer(build_model("embedding_mlp"), cfg, **kw).fit(
        ds, verbose=False, state_dir=sd, resume=True
    )
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_rowio_matches_xla_path():
    """rowio=True (Pallas row-DMA gather/write, interpret mode) produces
    the same fused-Adam step as the XLA gather/scatter path, including
    drop-slot skipping for duplicate/out-of-range ids."""
    from jax.experimental.pallas import tpu as pltpu

    from sparrowrecsys_tpu.training.row_optim import (
        fused_row_adam_update,
        init_fused_row_adam,
    )

    rng = np.random.default_rng(11)
    v, d, b = 96, 8, 32
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    grad = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    # duplicates + a negative + an oversized id -> drop slots exercised
    ids = np.concatenate([
        rng.integers(0, v, b - 2), [-3], [v + 7]
    ]).astype(np.int32)
    ids = jnp.asarray(ids)

    st0 = init_fused_row_adam(table)
    out_xla = fused_row_adam_update(st0, grad, ids, learning_rate=1e-3)
    with pltpu.force_tpu_interpret_mode():
        out_rio = fused_row_adam_update(
            st0, grad, ids, learning_rate=1e-3, rowio=True
        )
    assert int(out_xla.count) == int(out_rio.count)
    np.testing.assert_allclose(
        np.asarray(out_xla.buf), np.asarray(out_rio.buf), rtol=1e-6, atol=1e-7
    )
