"""The packed-column device-resident epoch must be equivalent to the
streamed per-batch path (same math, different batching machinery), and
must handle non-1D feature columns via the per-column fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer


def test_resident_matches_streamed():
    """fit() picks device-resident (packed) vs streamed by dataset size;
    with shuffle OFF both must produce identical training trajectories."""
    ds = synthetic_ctr_dataset(512)
    cfg = TrainConfig(batch_size=128, epochs=2, seed=0, shuffle_each_epoch=False)

    model = build_model("embedding_mlp")
    t1 = Trainer(model, cfg)
    res1 = t1.fit(ds, verbose=False)

    t2 = Trainer(model, cfg)
    t2.device_resident_bytes = 0  # force the streamed path
    res2 = t2.fit(ds, verbose=False)

    for a, b in zip(
        jax.tree_util.tree_leaves(res1.params),
        jax.tree_util.tree_leaves(res2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_epoch_handles_2d_columns():
    """A [N, T] feature column must survive packing (per-column take)."""
    import flax.linen as nn

    class SeqModel(nn.Module):
        @nn.compact
        def __call__(self, feats):
            # consume a 2-D int column + a scalar float column
            emb = nn.Embed(100, 4)(feats["history"])  # [B, T, 4]
            x = emb.mean(axis=1)
            x = jnp.concatenate([x, feats["bias"][:, None]], axis=-1)
            return nn.Dense(1)(x)[..., 0]

    rng = np.random.default_rng(0)
    n = 256
    feats = {
        "history": rng.integers(0, 100, size=(n, 7)).astype(np.int32),
        "bias": rng.normal(size=n).astype(np.float32),
        "userId": rng.integers(0, 50, size=n).astype(np.int32),
    }
    labels = (rng.random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    trainer = Trainer(SeqModel(), TrainConfig(batch_size=64, epochs=2, seed=0))
    res = trainer.fit(ds, verbose=False)
    assert np.isfinite([h["loss"] for h in res.history]).all()


def test_exact_shuffle_matches_per_step_gather():
    """The pre-permuted scan-xs epoch must produce the SAME trajectory as
    manually gathering `permutation(key, n)` rows batch-by-batch through
    `_train_step` — i.e. the restructuring (tools/step_exp7.py) changed
    the schedule, not the math. Includes a padded final batch."""
    from sparrowrecsys_tpu.ops import metrics as M

    n, batch = 300, 128
    ds = synthetic_ctr_dataset(n)
    model = build_model("embedding_mlp")
    cfg = TrainConfig(batch_size=batch, epochs=1, seed=0)
    key = jax.random.PRNGKey(7)

    t1 = Trainer(model, cfg)
    t1._build_steps()
    params1 = t1.init_params(ds.features)
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels = jnp.asarray(ds.labels)
    p1, _, m1 = t1._train_epoch(
        params1, t1.tx.init(params1), M.init_metrics(), data, labels, key,
        n=n, batch_size=batch, shuffle=True,
    )

    t2 = Trainer(model, cfg)
    t2._build_steps()
    params2 = t2.init_params(ds.features)
    steps = -(-n // batch)
    padded = steps * batch
    order = np.pad(
        np.asarray(jax.random.permutation(key, n)).astype(np.int64),
        (0, padded - n),
    )
    mask_all = (np.arange(padded) < n).astype(np.float32)
    carry = (params2, t2.tx.init(params2), M.init_metrics())
    for s in range(steps):
        idx = order[s * batch:(s + 1) * batch]
        fb = {k: jnp.asarray(v[idx]) for k, v in ds.features.items()}
        lb = jnp.asarray(ds.labels[idx])
        mb = jnp.asarray(mask_all[s * batch:(s + 1) * batch])
        carry = t2._train_step(*carry, fb, lb, mb)

    assert float(m1.count) == n == float(carry[2].count)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1),
        jax.tree_util.tree_leaves(carry[0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_blocks_shuffle_mode():
    """Opt-in block shuffle: pad rows land INSIDE permuted blocks, so the
    mask must travel with the data — masked example count stays n. A
    block size that doesn't divide the padded epoch falls back to exact."""
    from sparrowrecsys_tpu.ops import metrics as M

    n, batch = 300, 128  # padded epoch 384
    ds = synthetic_ctr_dataset(n)
    model = build_model("embedding_mlp")
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels = jnp.asarray(ds.labels)
    for block in (64, 100):  # 384 % 64 == 0 (blocks); 384 % 100 != 0 (fallback)
        t = Trainer(
            model,
            TrainConfig(
                batch_size=batch, epochs=1, seed=0,
                shuffle_mode="blocks", shuffle_block=block,
            ),
        )
        t._build_steps()
        params = t.init_params(ds.features)
        p, _, m = t._train_epoch(
            params, t.tx.init(params), M.init_metrics(), data, labels,
            jax.random.PRNGKey(3), n=n, batch_size=batch, shuffle=True,
        )
        assert float(m.count) == n, block
        em = M.finalize_metrics(m)
        assert np.isfinite(float(em["loss"])), block


def test_epoch_unroll_preserves_trajectory():
    """epoch_unroll replicates the scan body — same batch schedule, same
    math. XLA fuses the replicated bodies differently, so allow f32
    reassociation noise (measured ~1e-9 rel) but nothing more."""
    ds = synthetic_ctr_dataset(1024, seed=5)
    results = []
    for unroll in (1, 2, 4):
        cfg = TrainConfig(batch_size=128, epochs=2, seed=0,
                          epoch_unroll=unroll)
        res = Trainer(build_model("deepfm"), cfg).fit(ds, verbose=False)
        results.append(jax.tree_util.tree_leaves(res.params))
    for leaves in results[1:]:
        for a, b in zip(results[0], leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


def test_wide_schema_packed_epoch_matches_streamed():
    """64-length-history datasets pack >70 scalar columns; the transpose
    pack (no unit-dim intermediates — the t64 HBM blow-up fix, see
    tools/t64_oom_probe.py) must stay numerically equivalent to the
    streamed per-batch path."""
    from sparrowrecsys_tpu.data.synthetic import synthetic_sequence_ctr_dataset

    ds = synthetic_sequence_ctr_dataset(512, seed=3, t=64)
    assert sum(v.ndim == 1 for v in ds.features.values()) >= 70
    cfg = TrainConfig(batch_size=128, epochs=1, seed=0,
                      shuffle_each_epoch=False)
    model = build_model("din", recent_movies=64)
    res1 = Trainer(model, cfg).fit(ds, verbose=False)
    t2 = Trainer(model, cfg)
    t2.device_resident_bytes = 0  # force the streamed path
    res2 = t2.fit(ds, verbose=False)
    for a, b in zip(
        jax.tree_util.tree_leaves(res1.params),
        jax.tree_util.tree_leaves(res2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
