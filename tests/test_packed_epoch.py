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
