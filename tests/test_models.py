"""Model-zoo tests: init/forward shapes, learnability on a synthetic rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.data.negatives import add_dien_negatives
from sparrowrecsys_tpu.models import MODEL_REGISTRY, build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.training.loop import Trainer


def synthetic_dataset(n=512, seed=0):
    """Labels depend on userAvgRating and movieId parity — learnable by
    every architecture in a few hundred steps."""
    rng = np.random.default_rng(seed)
    movie = rng.integers(1, 1001, n).astype(np.int32)
    user = rng.integers(1, 30001, n).astype(np.int32)
    feats = {
        "movieId": movie,
        "userId": user,
        "userRatedMovie1": rng.integers(0, 1001, n).astype(np.int32),
        "userRatedMovie2": rng.integers(0, 1001, n).astype(np.int32),
        "userRatedMovie3": rng.integers(0, 1001, n).astype(np.int32),
        "userRatedMovie4": rng.integers(0, 1001, n).astype(np.int32),
        "userRatedMovie5": rng.integers(0, 1001, n).astype(np.int32),
        "userGenre1": rng.integers(-1, 19, n).astype(np.int32),
        "userGenre2": rng.integers(-1, 19, n).astype(np.int32),
        "userGenre3": rng.integers(-1, 19, n).astype(np.int32),
        "userGenre4": rng.integers(-1, 19, n).astype(np.int32),
        "userGenre5": rng.integers(-1, 19, n).astype(np.int32),
        "movieGenre1": rng.integers(-1, 19, n).astype(np.int32),
        "movieGenre2": rng.integers(-1, 19, n).astype(np.int32),
        "movieGenre3": rng.integers(-1, 19, n).astype(np.int32),
        "releaseYear": np.full(n, 0.02, np.float32),
        "movieRatingCount": np.full(n, 0.1, np.float32),
        "movieAvgRating": rng.normal(size=n).astype(np.float32),
        "movieRatingStddev": np.full(n, 0.5, np.float32),
        "userRatingCount": np.full(n, 0.1, np.float32),
        "userAvgRating": rng.normal(size=n).astype(np.float32),
        "userRatingStddev": np.full(n, 0.5, np.float32),
        "userAvgReleaseYear": np.full(n, 0.02, np.float32),
        "userReleaseYearStddev": np.full(n, 0.5, np.float32),
    }
    logit = 2.0 * feats["userAvgRating"] - 1.0 * feats["movieAvgRating"]
    labels = (logit + 0.3 * rng.normal(size=n) > 0).astype(np.float32)
    return EncodedDataset(feats, labels)


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset()


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name, ds):
    model = build_model(name)
    feats = {k: jnp.asarray(v[:8]) for k, v in ds.features.items()}
    if name == "dien":
        feats.update(
            {
                c: jnp.asarray(np.arange(8, dtype=np.int32) + 1)
                for c in (
                    "negativeUserRatedMovie2", "negativeUserRatedMovie3",
                    "negativeUserRatedMovie4", "negativeUserRatedMovie5",
                )
            }
        )
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    out = model.apply({"params": params}, feats)
    if name == "dien":
        logits, aux = out
        assert logits.shape == (8,) and aux.shape == (8,)
    else:
        assert out.shape == (8,)


@pytest.mark.parametrize("name", ["embedding_mlp", "deepfm", "din"])
def test_model_learns_synthetic_rule(name, ds):
    model = build_model(name)
    cfg = TrainConfig(batch_size=128, epochs=8, learning_rate=3e-3)
    tr = Trainer(model, cfg)
    res = tr.fit(ds, test=ds, verbose=False)
    assert res.eval_metrics["roc_auc"] > 0.8, res.eval_metrics


def test_dien_trains_with_aux_loss(ds):
    d = add_dien_negatives(ds, seed=2020)
    model = build_model("dien", aux_mode="paper")
    cfg = TrainConfig(batch_size=128, epochs=3, learning_rate=3e-3)
    tr = Trainer(model, cfg, loss_fn=dien_loss_fn(aux_mode="paper"))
    res = tr.fit(d, test=d, verbose=False)
    assert np.isfinite(res.history[-1]["loss"])
    assert res.eval_metrics["roc_auc"] > 0.6


def test_dien_merged_gather_bitwise_identical(ds):
    """merged_gather only restructures the movie-table lookup — same params,
    bitwise-equal (logits, aux) either way."""
    d = add_dien_negatives(ds, seed=2020)
    feats = {k: jnp.asarray(v[:32]) for k, v in d.features.items()}
    merged = build_model("dien", merged_gather=True)
    split = build_model("dien", merged_gather=False)
    params = merged.init(jax.random.PRNGKey(0), feats)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(
        split.init(jax.random.PRNGKey(0), feats)["params"]
    )
    lm, am = merged.apply({"params": params}, feats)
    ls, as_ = split.apply({"params": params}, feats)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(ls))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(as_))


def test_deepfm_v2_folded_projection_math(ds):
    """The block-diag field projection equals per-field x @ kernel + bias
    computed from the SAME params (LinParams preserves nn.Dense's paths)."""
    from sparrowrecsys_tpu.models.features import folded_projections

    rng = np.random.default_rng(3)
    xs = [
        jnp.asarray(rng.normal(size=(16, k)).astype(np.float32))
        for k in (10, 10, 10, 10, 7)
    ]
    kbs = [
        (
            jnp.asarray(rng.normal(size=(x.shape[-1], 64)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
        )
        for x in xs
    ]
    folded = folded_projections(xs, kbs, 64)
    ref = jnp.stack([x @ k + b for x, (k, b) in zip(xs, kbs)], axis=1)
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(ref), rtol=0, atol=1e-5
    )
    # And the model's param tree still carries nn.Dense-shaped entries.
    model = build_model("deepfm_v2")
    feats = {k: jnp.asarray(v[:8]) for k, v in ds.features.items()}
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    assert params["proj_item"]["kernel"].shape == (10, 64)
    assert params["proj_numeric"]["bias"].shape == (64,)


def test_folded_dense_matches_separate_heads():
    """Block-diag fold over heterogeneous head widths (DIEN aux heads:
    [*, 2D]->32 and [*, 32]->1) equals per-head x @ k + b."""
    from sparrowrecsys_tpu.models.features import folded_dense

    rng = np.random.default_rng(7)
    xs = [
        jnp.asarray(rng.normal(size=(4, 3, 20)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 3, 20)).astype(np.float32)),
    ]
    kbs = [
        (
            jnp.asarray(rng.normal(size=(20, n)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
        )
        for n in (32, 5)
    ]
    out = folded_dense(xs, kbs)
    assert out.shape == (4, 3, 37)
    np.testing.assert_allclose(
        np.asarray(out[..., :32]), np.asarray(xs[0] @ kbs[0][0] + kbs[0][1]),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out[..., 32:]), np.asarray(xs[1] @ kbs[1][0] + kbs[1][1]),
        rtol=0, atol=1e-5,
    )


def test_trainer_eval_matches_prediction_order(ds):
    model = build_model("neuralcf")
    tr = Trainer(model, TrainConfig(batch_size=100, epochs=1))
    res = tr.fit(ds, verbose=False)
    probs = tr.predict(res.params, ds)
    assert len(probs) == len(ds)


def test_dien_aux_none_structural_skip():
    """aux_mode='none' must (a) not require negative columns, (b) create no
    aux params, and (c) produce the same logits as the reference mode for
    the same seed (flax derives per-param RNG from the path, so shared
    params init identically)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparrowrecsys_tpu.models.dien import DIEN

    rng = np.random.default_rng(0)
    b = 8
    feats = {
        "movieId": jnp.asarray(rng.integers(1, 1001, b)),
        "userId": jnp.asarray(rng.integers(1, 30001, b)),
        "userGenre1": jnp.asarray(rng.integers(0, 19, b)),
        "movieGenre1": jnp.asarray(rng.integers(0, 19, b)),
    }
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = jnp.asarray(rng.normal(size=b).astype(np.float32))
    for k in range(1, 6):
        feats[f"userRatedMovie{k}"] = jnp.asarray(rng.integers(0, 1001, b))
    feats_with_neg = dict(feats)
    for k in range(2, 6):
        feats_with_neg[f"negativeUserRatedMovie{k}"] = jnp.asarray(
            rng.integers(1, 1001, b)
        )

    m_none = DIEN(aux_mode="none")
    p_none = m_none.init(jax.random.PRNGKey(0), feats)["params"]  # no neg cols
    assert not any(k.startswith("aux_") for k in p_none)

    m_ref = DIEN(aux_mode="reference")
    p_ref = m_ref.init(jax.random.PRNGKey(0), feats_with_neg)["params"]
    logits_none, aux_none = m_none.apply({"params": p_none}, feats)
    logits_ref, _ = m_ref.apply({"params": p_ref}, feats_with_neg)
    np.testing.assert_array_equal(np.asarray(logits_none), np.asarray(logits_ref))
    np.testing.assert_array_equal(np.asarray(aux_none), 0.0)


class TestDienInGraphNegatives:
    def test_sampler_distribution_and_determinism(self):
        import jax

        from sparrowrecsys_tpu.models.dien import sample_negatives_in_graph

        feats = {
            f"userRatedMovie{k}": jnp.asarray(
                np.random.default_rng(k).integers(0, 1001, 4096), jnp.int32
            )
            for k in range(1, 6)
        }
        out = sample_negatives_in_graph(jax.random.PRNGKey(0), feats)
        out2 = sample_negatives_in_graph(jax.random.PRNGKey(0), feats)
        for k in range(2, 6):
            neg = np.asarray(out[f"negativeUserRatedMovie{k}"])
            pos = np.asarray(feats[f"userRatedMovie{k}"])
            assert neg.min() >= 0 and neg.max() < 1001
            assert not np.any(neg == pos)  # same-column positive excluded
            np.testing.assert_array_equal(
                neg, np.asarray(out2[f"negativeUserRatedMovie{k}"])
            )  # deterministic per key

    def test_trains_without_negative_columns_and_resamples_per_epoch(self):
        """in_graph_negatives: the train set carries NO negative columns;
        the loss injects them from the per-step key the Trainer threads
        through (wants_rng protocol). Same seed -> bitwise-identical
        params (the negative stream is part of the seeded schedule)."""
        import jax

        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.data.negatives import add_dien_negatives
        from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.models.dien import dien_loss_fn
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = synthetic_ctr_dataset(512, seed=5)
        assert "negativeUserRatedMovie2" not in ds.features
        test = add_dien_negatives(synthetic_ctr_dataset(256, seed=6), seed=2021)
        loss = dien_loss_fn(aux_mode="paper", alpha=0.1,
                            in_graph_negatives=True)
        assert loss.wants_rng

        def run():
            tr = Trainer(
                build_model("dien", aux_mode="paper", alpha=0.1),
                TrainConfig(batch_size=128, epochs=2, seed=3),
                loss_fn=loss,
            )
            return tr.fit(ds, test=test, verbose=False)

        r1 = run()
        assert np.isfinite(r1.history[-1]["loss"])
        assert 0.0 <= r1.eval_metrics["roc_auc"] <= 1.0
        r2 = run()
        for a, b in zip(
            jax.tree_util.tree_leaves(r1.params),
            jax.tree_util.tree_leaves(r2.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonresident_path_threads_keys_too(self):
        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.models.dien import dien_loss_fn
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = synthetic_ctr_dataset(256, seed=5)
        tr = Trainer(
            build_model("dien", aux_mode="paper", alpha=0.1),
            TrainConfig(batch_size=64, epochs=1, seed=3),
            loss_fn=dien_loss_fn(aux_mode="paper", alpha=0.1,
                                 in_graph_negatives=True),
        )
        tr.device_resident_bytes = 0  # force the streamed per-batch path
        res = tr.fit(ds, verbose=False)
        assert np.isfinite(res.history[-1]["loss"])


def test_dien_aux_norm_mean_scales_by_valid_steps(ds):
    """aux_norm='mean' equals the summed paper aux divided by the
    per-example count of valid next-step positions (VERDICT r4 #3a:
    decouples alpha from history length T)."""
    from sparrowrecsys_tpu.models.dien import DIEN

    feats = {k: jnp.asarray(v[:8]) for k, v in ds.features.items()}
    feats.update(
        {
            c: jnp.asarray(np.arange(8, dtype=np.int32) + 1)
            for c in (
                "negativeUserRatedMovie2", "negativeUserRatedMovie3",
                "negativeUserRatedMovie4", "negativeUserRatedMovie5",
            )
        }
    )
    # Mask some tail history so valid counts differ across rows.
    h5 = np.asarray(feats["userRatedMovie5"]).copy()
    h5[:4] = 0
    feats["userRatedMovie5"] = jnp.asarray(h5)
    m_sum = DIEN(aux_mode="paper", aux_norm="sum")
    m_mean = DIEN(aux_mode="paper", aux_norm="mean")
    params = m_sum.init(jax.random.PRNGKey(0), feats)["params"]
    logits_s, aux_s = m_sum.apply({"params": params}, feats)
    logits_m, aux_m = m_mean.apply({"params": params}, feats)
    np.testing.assert_array_equal(np.asarray(logits_s), np.asarray(logits_m))
    hist = np.stack(
        [np.asarray(feats[f"userRatedMovie{k}"]) for k in range(1, 6)], axis=1
    )
    valid = (hist[:, 1:] > 0).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(aux_m), np.asarray(aux_s) / np.maximum(valid, 1),
        rtol=1e-6,
    )


def test_embedding_mlp_bf16_lookup_matches_bf16_tower():
    """lookup_dtype='bfloat16' (cast-then-gather, fp32 master params)
    produces the same forward as the default bf16 tower (gather-then-
    cast): bf16(row) is the value either way."""
    import numpy as np

    from sparrowrecsys_tpu.data.synthetic import synthetic_ctr_dataset
    from sparrowrecsys_tpu.models import build_model

    ds = synthetic_ctr_dataset(64, seed=3)
    feats = {k: jnp.asarray(v) for k, v in ds.features.items()}
    base = build_model("embedding_mlp", compute_dtype="bfloat16")
    fast = build_model("embedding_mlp", compute_dtype="bfloat16",
                       lookup_dtype="bfloat16")
    params = base.init(jax.random.PRNGKey(0), feats)["params"]
    np.testing.assert_array_equal(
        np.asarray(base.apply({"params": params}, feats)),
        np.asarray(fast.apply({"params": params}, feats)),
    )
    # Grads exist and params stay fp32 (master weights).
    def loss(p, m):
        return jnp.sum(m.apply({"params": p}, feats) ** 2)

    g = jax.grad(loss)(params, fast)
    assert g["emb_userId"]["table"].dtype == jnp.float32
