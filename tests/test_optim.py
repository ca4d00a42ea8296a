"""grouped_adam must be numerically identical to optax.adam."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparrowrecsys_tpu.training.optim import grouped_adam


def _tree_close(a, b, atol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.parametrize("steps", [1, 5])
def test_matches_optax_adam(steps):
    rng = np.random.default_rng(0)
    params = {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(27, 64)), jnp.float32),
                  "bias": jnp.zeros((64,), jnp.float32)},
        "emb": {"table": jnp.asarray(rng.normal(size=(30001, 10)), jnp.float32)},
        "scalar": jnp.ones((), jnp.float32),
    }
    tx_ref = optax.adam(1e-3)
    tx_grp = grouped_adam(1e-3)
    o_ref, o_grp = tx_ref.init(params), tx_grp.init(params)
    p_ref = p_grp = params
    for step in range(steps):
        grads = jax.tree_util.tree_map(
            lambda x: 0.01 * (jnp.asarray(step + 1, jnp.float32)) * (x * 0 + 1) + 0.1 * x,
            p_ref,
        )
        u_ref, o_ref = tx_ref.update(grads, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        grads_g = jax.tree_util.tree_map(
            lambda x: 0.01 * (jnp.asarray(step + 1, jnp.float32)) * (x * 0 + 1) + 0.1 * x,
            p_grp,
        )
        u_grp, o_grp = tx_grp.update(grads_g, o_grp, p_grp)
        p_grp = optax.apply_updates(p_grp, u_grp)
    _tree_close(p_ref, p_grp)


def test_trainer_converges_same_as_before():
    """End-to-end: a tiny fit reaches a finite decreasing loss."""
    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    ds = synthetic_ctr_dataset(512)
    model = build_model("embedding_mlp")
    trainer = Trainer(model, TrainConfig(batch_size=128, epochs=3, seed=0))
    res = trainer.fit(ds, verbose=False)
    losses = [h["loss"] for h in res.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_int_and_mixed_dtype_leaves_stay_per_leaf():
    params = {
        "f32_small": jnp.ones((8,), jnp.float32),
        "i32": jnp.ones((8,), jnp.int32),  # not fused (dtype)
    }
    tx = grouped_adam(1e-3)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert updates["f32_small"].dtype == jnp.float32
    assert updates["i32"].shape == (8,)


def test_bf16_big_moments_storage_and_quality():
    """big_moment_dtype=bfloat16: moments for big leaves are STORED bf16
    (halved bytes), update math stays fp32, and the resulting updates
    track the fp32 optimizer closely at step 1 (identical up to one
    bf16 round of mu/nu)."""
    rng = np.random.default_rng(0)
    params = {
        "table": jnp.asarray(
            rng.normal(size=(70000, 4)).astype(np.float32)
        ),  # > SMALL_LEAF_MAX_ELEMS -> big leaf
        "w": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    grads = {
        "table": jnp.asarray(
            rng.normal(size=(70000, 4)).astype(np.float32)
        ),
        "w": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    tx32 = grouped_adam(1e-3)
    tx16 = grouped_adam(1e-3, big_moment_dtype=jnp.bfloat16)
    s32, s16 = tx32.init(params), tx16.init(params)
    assert s16.mu_big[0].dtype == jnp.bfloat16
    assert s16.nu_big[0].dtype == jnp.bfloat16
    assert s16.mu_vec.dtype == jnp.float32  # small leaves untouched
    u32, s32 = tx32.update(grads, s32, params)
    u16, s16 = tx16.update(grads, s16, params)
    # Step-1 updates are computed from fp32 inputs in both cases —
    # identical before storage rounding ever feeds back.
    np.testing.assert_array_equal(
        np.asarray(u32["table"]), np.asarray(u16["table"])
    )
    np.testing.assert_array_equal(np.asarray(u32["w"]), np.asarray(u16["w"]))
    # Step 2 sees bf16-rounded moments: close, not equal.
    u32b, _ = tx32.update(grads, s32, params)
    u16b, _ = tx16.update(grads, s16, params)
    np.testing.assert_allclose(
        np.asarray(u32b["table"]), np.asarray(u16b["table"]),
        rtol=2e-2, atol=2e-5,
    )


def test_trainer_bf16_moments_trains():
    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    ds = synthetic_ctr_dataset(512)
    model = build_model("embedding_mlp")
    trainer = Trainer(
        model,
        TrainConfig(batch_size=128, epochs=3, seed=0,
                    big_moment_dtype="bfloat16"),
    )
    res = trainer.fit(ds, verbose=False)
    losses = [h["loss"] for h in res.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_master_weights_bf16_params_track_master():
    """master_weights: a bf16-stored big leaf stays within 1 ulp of
    bf16(fp32 master) across steps (the rebase never compounds), and
    fp32/small leaves behave exactly as without masters."""
    rng = np.random.default_rng(1)
    master0 = rng.normal(size=(70000, 4)).astype(np.float32)
    prev_tgt = master0.astype("bfloat16").astype(np.float32)
    params = {
        "table": jnp.asarray(master0).astype(jnp.bfloat16),
        "w": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
    }
    tx = grouped_adam(1e-2, master_weights=True)
    txref = grouped_adam(1e-2)
    state = tx.init(params)
    assert state.master_big[0].dtype == jnp.float32
    # reference: pure fp32 Adam run on the master trajectory
    ref_params = {"table": state.master_big[0], "w": params["w"]}
    ref_state = txref.init(ref_params)
    for step in range(5):
        g32 = rng.normal(size=(70000, 4)).astype(np.float32)
        grads = {"table": jnp.asarray(g32).astype(jnp.bfloat16),
                 "w": jnp.asarray(rng.normal(size=(8,)).astype(np.float32))}
        u, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, u)
        ref_grads = {"table": jnp.asarray(grads["table"]).astype(jnp.float32),
                     "w": grads["w"]}
        ru, ref_state = txref.update(ref_grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, ru)
        # master in state == the fp32 reference trajectory, bitwise
        np.testing.assert_array_equal(
            np.asarray(state.master_big[0]), np.asarray(ref_params["table"])
        )
        # bf16 params track bf16(master) to 1 ulp
        tgt = np.asarray(ref_params["table"]).astype(
            jnp.bfloat16.dtype if hasattr(jnp.bfloat16, "dtype") else "bfloat16"
        ).astype(np.float32)
        got = np.asarray(params["table"]).astype(np.float32)
        err = np.abs(got - tgt)
        # The rebase error is ~1 bf16 ulp of the larger of the target
        # and this step's master MOVEMENT (the emitted delta rounds at
        # the movement's exponent); it does not compound across steps.
        move = np.abs(tgt - prev_tgt)
        prev_tgt = tgt
        scale = np.maximum(np.abs(tgt), move)
        ulp = np.maximum(2.0 * scale * 2.0 ** -8, 2.0 ** -126)
        assert (err <= ulp + 1e-30).all(), float(err.max())
        # fp32 small leaf identical with and without master machinery
        np.testing.assert_array_equal(
            np.asarray(params["w"]), np.asarray(ref_params["w"])
        )


def test_trainer_bf16_table_params_trains():
    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    ds = synthetic_ctr_dataset(512)
    trainer = Trainer(
        build_model("embedding_mlp"),
        TrainConfig(batch_size=128, epochs=3, seed=0,
                    bf16_table_params=True),
    )
    # user table (30001 x 10 = 300k elems) crosses the big-leaf bar
    sample = {k: v[:2] for k, v in ds.features.items()}
    p = trainer.init_params(sample)
    assert p["emb_userId"]["table"].dtype == jnp.bfloat16
    assert p["emb_movieId"]["table"].dtype == jnp.float32  # small leaf
    res = trainer.fit(ds, verbose=False)
    losses = [h["loss"] for h in res.history]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
