"""Unit tests for sparrowrecsys_tpu.ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.ops.embedding import embed_lookup, sharded_lookup
from sparrowrecsys_tpu.ops.fm import fm_cross_pallas, fm_cross_xla
from sparrowrecsys_tpu.ops.attention import din_attention_xla
from sparrowrecsys_tpu.ops.augru import (
    AUGRUGate,
    AUGRUParams,
    GRUParams,
    augru,
    gru,
)


class TestMetrics:
    def test_streaming_auc_close_to_exact(self):
        rng = np.random.default_rng(0)
        n = 5000
        labels = rng.integers(0, 2, n).astype(np.float32)
        # informative but noisy scores
        probs = np.clip(
            0.3 * labels + 0.35 + 0.25 * rng.random(n), 0, 1
        ).astype(np.float32)
        state = M.init_metrics()
        for i in range(0, n, 1000):
            p, l = jnp.asarray(probs[i : i + 1000]), jnp.asarray(labels[i : i + 1000])
            state = M.update_metrics(state, p, l, jnp.sum(p * 0))
        out = {k: float(v) for k, v in M.finalize_metrics(state).items()}
        exact = M.exact_auc(probs, labels)
        assert abs(out["roc_auc"] - exact["roc_auc"]) < 0.01
        assert abs(out["pr_auc"] - exact["pr_auc"]) < 0.02

    def test_exact_auc_perfect_classifier(self):
        labels = np.array([0, 0, 1, 1], np.float32)
        probs = np.array([0.1, 0.2, 0.8, 0.9], np.float32)
        out = M.exact_auc(probs, labels)
        assert out["roc_auc"] == pytest.approx(1.0)
        assert out["pr_auc"] == pytest.approx(1.0)

    def test_exact_auc_random(self):
        labels = np.array([0, 1, 0, 1], np.float32)
        probs = np.array([0.5, 0.5, 0.5, 0.5], np.float32)
        assert M.exact_auc(probs, labels)["roc_auc"] == pytest.approx(0.5)

    def test_masked_update_ignores_padding(self):
        state = M.init_metrics()
        probs = jnp.array([0.9, 0.1, 0.7, 0.7])
        labels = jnp.array([1.0, 0.0, 1.0, 1.0])
        mask = jnp.array([1.0, 1.0, 0.0, 0.0])
        state = M.update_metrics(state, probs, labels, jnp.float32(0), mask)
        assert float(state.count) == 2.0
        assert float(state.pos) == 1.0


class TestEmbedding:
    def test_oov_and_mask_zero(self):
        table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3) + 1.0
        ids = jnp.array([-1, 0, 3])
        out = embed_lookup(table, ids)
        assert np.allclose(out[0], 0.0)
        assert np.allclose(out[1], table[0])
        out = embed_lookup(table, ids, mask_zero=True)
        assert np.allclose(out[1], 0.0)
        assert np.allclose(out[2], table[3])

    def test_packed_multi_lookup_matches_per_table(self):
        """One packed gather == the per-column embed_lookup chain, bitwise,
        forward AND gradient (the custom VJP reproduces embed_lookup's
        per-table one-hot/scatter backward exactly)."""
        from sparrowrecsys_tpu.ops.embedding import packed_multi_lookup

        rng = np.random.default_rng(0)
        tables = [
            jnp.asarray(rng.normal(size=(v, 6)).astype(np.float32))
            for v in (11, 3000, 5)  # spans one-hot (<=2048) + scatter paths
        ]
        ids = [
            jnp.asarray(rng.integers(-2, v + 2, 32).astype(np.int32))
            for v in (11, 3000, 5)
        ]
        lo = (0, 0, 1)  # last column exercises mask_zero semantics

        def ref(tabs):
            return [
                embed_lookup(t, i, mask_zero=(l == 1))
                for t, i, l in zip(tabs, ids, lo)
            ]

        def packed(tabs):
            return list(packed_multi_lookup(tabs, ids, lo))

        for r, p in zip(ref(tables), packed(tables)):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(p))

        def loss(fn, tabs):
            return sum(jnp.sum(jnp.sin(o)) for o in fn(tabs))

        gr = jax.grad(lambda ts: loss(ref, ts))(tables)
        gp = jax.grad(lambda ts: loss(packed, ts))(tables)
        for a, b in zip(gr, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_packed_embed_bias_matches_merged(self):
        from sparrowrecsys_tpu.models.features import (
            merged_embed_bias,
            packed_embed_bias,
        )

        rng = np.random.default_rng(1)
        cols = []
        for v in (1001, 30001, 19, 19):
            cols.append(
                (
                    jnp.asarray(rng.normal(size=(v, 10)).astype(np.float32)),
                    jnp.asarray(rng.normal(size=(v, 1)).astype(np.float32)),
                    jnp.asarray(rng.integers(-1, v, 64).astype(np.int32)),
                )
            )
        packed = packed_embed_bias(cols)
        for (emb_t, bias_t, idx), (pe, pb) in zip(cols, packed):
            re, rb = merged_embed_bias(emb_t, bias_t, idx)
            np.testing.assert_array_equal(np.asarray(re), np.asarray(pe))
            np.testing.assert_array_equal(np.asarray(rb), np.asarray(pb))

    def test_sharded_lookup_matches_gather(self):
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.array(devs).reshape(4, 2), ("data", "model"))
        table = jnp.asarray(
            np.random.default_rng(0).normal(size=(1003, 8)).astype(np.float32)
        )
        ids = jnp.asarray(
            np.random.default_rng(1).integers(0, 1003, 64).astype(np.int32)
        )
        out = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))(table, ids)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )


class TestFM:
    def test_fm_identity_vs_explicit_pairs(self):
        """sum-square minus square-sum == 2 * sum over pairs of elementwise
        products (the FM identity the reference's graph encodes)."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(16, 5, 8)).astype(np.float32))
        out = fm_cross_xla(x)
        f = x.shape[1]
        pairs = sum(
            2.0 * x[:, i] * x[:, j] for i in range(f) for j in range(i + 1, f)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(pairs), rtol=1e-4)

    def test_pallas_interpret_matches_xla(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(256, 5, 64)).astype(np.float32))
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out_p = fm_cross_pallas(x)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(fm_cross_xla(x)), rtol=1e-4, atol=1e-4
        )


class TestAttention:
    def test_masked_steps_contribute_zero(self):
        rng = np.random.default_rng(0)
        b, t, dim = 4, 5, 10
        hist = rng.normal(size=(b, t, dim)).astype(np.float32)
        hist[:, 3:] = 0.0  # padded steps (zeroed by mask_zero embedding)
        cand = rng.normal(size=(b, dim)).astype(np.float32)
        w1 = rng.normal(size=(4 * dim, 32)).astype(np.float32)
        b1 = np.zeros(32, np.float32)
        alpha = np.zeros(32, np.float32)
        w2 = rng.normal(size=(32, 1)).astype(np.float32)
        b2 = np.zeros(1, np.float32)
        full = din_attention_xla(*map(jnp.asarray, (hist, cand, w1, b1, alpha, w2, b2)))
        trunc = din_attention_xla(
            *map(jnp.asarray, (hist[:, :3], cand, w1, b1, alpha, w2, b2))
        )
        np.testing.assert_allclose(np.asarray(full), np.asarray(trunc), rtol=1e-5)


class TestAUGRU:
    def _params(self, d, rng):
        g = lambda: AUGRUGate(
            w=jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1),
            b=jnp.zeros(d),
            u=jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1),
        )
        return AUGRUParams(r=g(), z=g(), h=g())

    def test_zero_attention_keeps_initial_state(self):
        rng = np.random.default_rng(0)
        d = 6
        params = self._params(d, rng)
        states = jnp.asarray(rng.normal(size=(3, 5, d)).astype(np.float32))
        att = jnp.zeros((3, 5, d))
        out = augru(params, states, att)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_gru_shapes_and_determinism(self):
        rng = np.random.default_rng(0)
        d = 10
        params = GRUParams(
            kernel=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1),
            recurrent=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1),
            bias=jnp.zeros(3 * d),
        )
        x = jnp.asarray(rng.normal(size=(4, 5, d)).astype(np.float32))
        h = gru(params, x)
        assert h.shape == (4, 5, d)
        np.testing.assert_allclose(np.asarray(h), np.asarray(gru(params, x)))


def test_embed_lookup_out_of_range_zeroes():
    """Review regression: oversized ids must not alias to the last row."""
    import jax.numpy as jnp

    table = jnp.arange(8, dtype=jnp.float32).reshape(4, 2) + 1.0
    out = embed_lookup(table, jnp.array([3, 4, 1000]))
    assert np.allclose(out[0], table[3])
    assert np.allclose(out[1], 0.0) and np.allclose(out[2], 0.0)


def test_din_fused_custom_vjp_matches_xla_grads():
    """The pallas-forward custom-VJP path must produce the same gradients
    as the XLA formulation (checked in interpret mode off-TPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from sparrowrecsys_tpu.ops.attention import (
        _din_attention_fused,
        din_attention_xla,
    )

    rng = np.random.default_rng(0)
    b, t, d, h = 8, 8, 4, 8
    args = [
        jnp.asarray(rng.normal(size=s).astype(np.float32))
        for s in [(b, t, d), (b, d), (4 * d, h), (h,), (h,), (h, 1), (1,)]
    ]

    def loss_fused(*a):
        return jnp.sum(_din_attention_fused(*a) ** 2)

    def loss_xla(*a):
        return jnp.sum(din_attention_xla(*a) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_gru_mask_carries_state():
    """Masked (padded) timesteps carry the previous hidden state — Keras
    mask_zero parity for DIEN's behaviour GRU."""
    rng = np.random.default_rng(0)
    d = 6
    params = GRUParams(
        kernel=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.3),
        recurrent=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.3),
        bias=jnp.zeros(3 * d),
    )
    x = jnp.asarray(rng.normal(size=(2, 5, d)).astype(np.float32))
    mask = jnp.asarray([[True, True, False, False, False]] * 2)
    h = gru(params, x, mask)
    # After the last valid step, the state must stay frozen.
    np.testing.assert_allclose(np.asarray(h[:, 2]), np.asarray(h[:, 1]))
    np.testing.assert_allclose(np.asarray(h[:, 4]), np.asarray(h[:, 1]))
    # And equals the unmasked GRU run on the truncated sequence.
    h_trunc = gru(params, x[:, :2])
    np.testing.assert_allclose(
        np.asarray(h[:, 1]), np.asarray(h_trunc[:, 1]), rtol=1e-6
    )


def test_fm_cross_custom_vjp_matches_autodiff():
    """fm_cross_pallas's hand-written backward (fm_cross_bwd) must equal
    autodiff through the XLA expression — without the custom VJP,
    training through the Pallas path fails at linearization (hit by
    DeepFMv2 at batch >= 32768, tools/zoo_bench.py)."""
    import jax

    from sparrowrecsys_tpu.ops.fm import fm_cross_bwd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 5, 16)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))

    auto = jax.grad(lambda v: jnp.sum(fm_cross_xla(v) * g))(x)
    np.testing.assert_allclose(
        np.asarray(fm_cross_bwd(x, g)), np.asarray(auto), rtol=1e-4, atol=1e-4
    )


class TestRecurrenceCustomVJP:
    """The hand-written GRU/AUGRU backwards (weight grads as ONE stacked
    [T*B, H] matmul, ops/augru.py) must match lax.scan autodiff: forward
    bitwise, gradients to f32-reassociation tolerance."""

    def _gru_params(self, d, rng):
        return GRUParams(
            kernel=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.3),
            recurrent=jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.3),
            bias=jnp.asarray(rng.normal(size=(3 * d,)).astype(np.float32) * 0.1),
        )

    def _augru_params(self, d, rng):
        g = lambda: AUGRUGate(
            w=jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3),
            b=jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1),
            u=jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.3),
        )
        return AUGRUParams(r=g(), z=g(), h=g())

    @pytest.mark.parametrize("with_mask", [False, True])
    def test_gru_grads_match_autodiff(self, with_mask):
        rng = np.random.default_rng(0)
        b, t, d = 7, 6, 5
        params = self._gru_params(d, rng)
        x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
        mask = (
            jnp.asarray(rng.random((b, t)) < 0.7) if with_mask else None
        )
        # Weighted sum so every (b, t, h) output position carries a distinct
        # cotangent (catches transposition/ordering bugs a plain sum hides).
        w = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))

        def loss(p, xx, custom):
            return jnp.sum(gru(p, xx, mask, custom_vjp=custom) * w)

        out_c = gru(params, x, mask, custom_vjp=True)
        out_a = gru(params, x, mask, custom_vjp=False)
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_a))

        gc = jax.grad(loss, argnums=(0, 1))(params, x, True)
        ga = jax.grad(loss, argnums=(0, 1))(params, x, False)
        for a, b_ in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_augru_grads_match_autodiff(self):
        rng = np.random.default_rng(1)
        b, t, d = 7, 6, 5
        params = self._augru_params(d, rng)
        states = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
        att = jnp.asarray(rng.random((b, t, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

        def loss(p, s, a, custom):
            return jnp.sum(augru(p, s, a, custom_vjp=custom) * w)

        out_c = augru(params, states, att, custom_vjp=True)
        out_a = augru(params, states, att, custom_vjp=False)
        np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_a))

        gc = jax.grad(loss, argnums=(0, 1, 2))(params, states, att, True)
        ga = jax.grad(loss, argnums=(0, 1, 2))(params, states, att, False)
        for a, b_ in zip(jax.tree.leaves(gc), jax.tree.leaves(ga)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    @pytest.mark.parametrize("with_mask", [False, True])
    def test_gru_remat_matches_default(self, with_mask):
        """remat=True recomputes the same per-step math — outputs and grads
        equal to f32 fusion reassociation (checkpoint changes XLA's fusion
        groupings, so not bitwise)."""
        rng = np.random.default_rng(3)
        b, t, d = 7, 6, 5
        params = self._gru_params(d, rng)
        x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
        mask = jnp.asarray(rng.random((b, t)) < 0.7) if with_mask else None
        w = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))

        def loss(p, xx, rem):
            return jnp.sum(gru(p, xx, mask, remat=rem) * w)

        np.testing.assert_allclose(
            np.asarray(gru(params, x, mask, remat=True)),
            np.asarray(gru(params, x, mask, remat=False)),
            rtol=1e-5,
            atol=1e-6,
        )
        gr = jax.grad(loss, argnums=(0, 1))(params, x, True)
        ga = jax.grad(loss, argnums=(0, 1))(params, x, False)
        for a, b_ in zip(jax.tree.leaves(gr), jax.tree.leaves(ga)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_augru_remat_matches_default(self):
        rng = np.random.default_rng(4)
        b, t, d = 7, 6, 5
        params = self._augru_params(d, rng)
        states = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
        att = jnp.asarray(rng.random((b, t, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

        def loss(p, s, a, rem):
            return jnp.sum(augru(p, s, a, remat=rem) * w)

        np.testing.assert_allclose(
            np.asarray(augru(params, states, att, remat=True)),
            np.asarray(augru(params, states, att, remat=False)),
            rtol=1e-5,
            atol=1e-6,
        )
        gr = jax.grad(loss, argnums=(0, 1, 2))(params, states, att, True)
        ga = jax.grad(loss, argnums=(0, 1, 2))(params, states, att, False)
        for a, b_ in zip(jax.tree.leaves(gr), jax.tree.leaves(ga)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-6
            )

    def test_remat_and_custom_vjp_exclusive(self):
        rng = np.random.default_rng(5)
        params = self._gru_params(4, rng)
        x = jnp.zeros((2, 3, 4), np.float32)
        with pytest.raises(ValueError):
            gru(params, x, custom_vjp=True, remat=True)
        ap = self._augru_params(4, rng)
        with pytest.raises(ValueError):
            augru(ap, x, jnp.ones_like(x), custom_vjp=True, remat=True)

    def test_dien_model_grads_match_across_vjp_modes(self):
        """End-to-end: the full DIEN loss gradient is the same (to f32
        reassociation) with the custom recurrence backward on and off."""
        from sparrowrecsys_tpu.models.dien import DIEN, dien_loss_fn

        rng = np.random.default_rng(2)
        b = 16
        feats = {
            "movieId": jnp.asarray(rng.integers(1, 1001, b)),
            "userId": jnp.asarray(rng.integers(1, 30001, b)),
            "userGenre1": jnp.asarray(rng.integers(0, 19, b)),
            "movieGenre1": jnp.asarray(rng.integers(0, 19, b)),
            "releaseYear": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "movieRatingCount": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "movieAvgRating": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "movieRatingStddev": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "userRatingCount": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "userAvgRating": jnp.asarray(rng.normal(size=b).astype(np.float32)),
            "userRatingStddev": jnp.asarray(rng.normal(size=b).astype(np.float32)),
        }
        for k in range(1, 6):
            feats[f"userRatedMovie{k}"] = jnp.asarray(
                rng.integers(0, 1001, b)
            )
        for k in range(2, 6):
            feats[f"negativeUserRatedMovie{k}"] = jnp.asarray(
                rng.integers(1, 1001, b)
            )
        labels = jnp.asarray(rng.integers(0, 2, b).astype(np.float32))
        msk = jnp.ones(b, np.float32)
        loss_fn = dien_loss_fn()

        grads, losses = {}, {}
        modes = {
            "default": {},
            "custom": {"recurrence_custom_vjp": True},
            "remat": {"recurrence_remat": True},
        }
        for name, kw in modes.items():
            model = DIEN(**kw)
            params = model.init(jax.random.PRNGKey(0), feats)["params"]

            def loss(p):
                return loss_fn(model.apply, p, feats, labels, msk)[0]

            losses[name] = float(loss(params))
            grads[name] = jax.grad(loss)(params)

        for name in ("custom", "remat"):
            # custom_vjp shares the forward graph exactly; remat's
            # checkpoint wrapper changes fusion groupings (reassociation).
            if name == "custom":
                assert losses[name] == losses["default"]
            else:
                np.testing.assert_allclose(
                    losses[name], losses["default"], rtol=1e-6
                )
            for a, b_ in zip(
                jax.tree.leaves(grads[name]), jax.tree.leaves(grads["default"])
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b_), rtol=2e-4, atol=1e-6
                )


def test_embed_lookup_onehot_forward_exact_at_wide_dims():
    """The wide-dim one-hot FORWARD path (ONEHOT_FWD_MIN_DIM) must be
    bitwise-equal to a plain row gather (one-hot terms are exact 0.0 or
    the row itself), including OOV/mask-zero semantics, and its autodiff
    backward must match the gather's."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparrowrecsys_tpu.ops import embedding as E

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(19, 128)).astype(np.float32))
    ids = jnp.asarray(
        np.array([0, 3, 18, -1, 7, 25], np.int32)  # incl. OOV both sides
    )
    assert table.shape[1] >= E.ONEHOT_FWD_MIN_DIM  # the path under test
    out = E.embed_lookup(table, ids)
    ref = jnp.where(
        ((ids >= 0) & (ids < 19))[:, None],
        jnp.take(table, jnp.clip(ids, 0, 18), axis=0),
        0.0,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    w = jnp.asarray(rng.normal(size=(6, 128)).astype(np.float32))
    g_oh = jax.grad(lambda t: jnp.sum(E.embed_lookup(t, ids) * w))(table)
    g_ref = jax.grad(
        lambda t: jnp.sum(
            jnp.where(
                ((ids >= 0) & (ids < 19))[:, None],
                jnp.take(t, jnp.clip(ids, 0, 18), axis=0),
                0.0,
            )
            * w
        )
    )(table)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ref), rtol=1e-6)


class TestRowIO:
    """ops/rowio.py: row-granular DMA gather/write (interpret mode —
    the TPU timing verdict lives in tools/pallas_rowio_probe.py)."""

    def _setup(self, v=300, d=128, u=64, dtype=np.float32):
        from sparrowrecsys_tpu.ops.rowio import (
            rows_gather_pallas, rows_write_pallas,
        )

        rng = np.random.default_rng(7)
        table = jnp.asarray(rng.normal(size=(v, d)).astype(dtype))
        ids = jnp.asarray(
            np.sort(rng.choice(v, size=u, replace=False)).astype(np.int32)
        )
        rows = jnp.asarray(rng.normal(size=(u, d)).astype(dtype))
        return rows_gather_pallas, rows_write_pallas, table, ids, rows

    def test_gather_matches_take(self):
        g, _, table, ids, _ = self._setup()
        out = g(table, ids, block=32, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[np.asarray(ids)]
        )

    def test_gather_depth_irrelevant_to_values(self):
        g, _, table, ids, _ = self._setup()
        for depth in (2, 8, 64):
            out = g(table, ids, block=32, depth=depth, interpret=True)
            np.testing.assert_array_equal(
                np.asarray(out), np.asarray(table)[np.asarray(ids)]
            )

    def test_write_matches_set(self):
        _, w, table, ids, rows = self._setup()
        out = w(table, ids, rows, block=32, interpret=True)
        ref = np.asarray(table).copy()
        ref[np.asarray(ids)] = np.asarray(rows)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_non_divisible_falls_back_to_xla(self):
        g, w, table, ids, rows = self._setup(u=63)
        out = g(table, ids, block=32, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[np.asarray(ids)]
        )
        out2 = w(table, ids, rows, block=32, interpret=True)
        ref = np.asarray(table).copy()
        ref[np.asarray(ids)] = np.asarray(rows)
        np.testing.assert_array_equal(np.asarray(out2), ref)

    def test_bfloat16_rows(self):
        g, w, table, ids, rows = self._setup(dtype=np.float32)
        table = table.astype(jnp.bfloat16)
        rows = rows.astype(jnp.bfloat16)
        out = g(table, ids, block=32, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[np.asarray(ids)]
        )
        out2 = w(table, ids, rows, block=32, interpret=True)
        ref = np.asarray(table).copy()
        ref[np.asarray(ids)] = np.asarray(rows)
        np.testing.assert_array_equal(np.asarray(out2), ref)

    def test_wide_rows_fall_back_to_xla(self):
        """D != 128 rows (e.g. the fused [V, 3D] optimizer buffer) fall
        back to the XLA ops — Mosaic rejects 1-row slices of anything
        but a single f32 lane tile (measured on v5e,
        pallas_rowio_probe; chunking to (1, 128) also fails)."""
        g, w, table, ids, rows = self._setup(d=384)
        out = g(table, ids, block=32, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[np.asarray(ids)]
        )
        out2 = w(table, ids, rows, block=32, interpret=True)
        ref = np.asarray(table).copy()
        ref[np.asarray(ids)] = np.asarray(rows)
        np.testing.assert_array_equal(np.asarray(out2), ref)

    def test_support_gate_is_exactly_f32_128(self):
        import jax.numpy as jnp

        from sparrowrecsys_tpu.ops.rowio import _rowio_supported

        assert _rowio_supported(128, np.float32)
        assert not _rowio_supported(384, np.float32)
        assert not _rowio_supported(64, np.float32)
        assert not _rowio_supported(128, jnp.bfloat16)
        g, w, table, ids, rows = self._setup(d=200)
        out = g(table, ids, block=32, interpret=True)  # XLA fallback
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(table)[np.asarray(ids)]
        )
