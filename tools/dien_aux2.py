"""Round-4 attack on DIEN's 2.09 ms aux block (VERDICT r3 #3).

dien_decomp2 isolated the aux machinery (negative-history gathers + aux
heads + their backward) at 2.09 ms of the ~10 ms step — 3x the
recurrences. This tool A/Bs the three restructurings VERDICT prescribes,
all trained on the identical packed pre-permuted epoch (step_exp8
harness), interleaved in one process, forced sync, best-of-3 rounds:

  base     : shipping DIEN (aux "reference", negatives as data columns
             packed into the epoch matrices, separate neg gather)
  ingraph  : negative ids sampled IN-SCAN (uniform over the vocab, like
             the reference's data-layer sampling, DIEN.py:31-49) — the 4
             negativeUserRatedMovie columns leave the packed epoch
             entirely (less pack/permute/slice traffic); distribution-
             identical, RNG-stream different
  sg_neg   : stop_gradient on the negative embeddings — bounds the
             negative gather's one-hot/scatter backward into the shared
             1001-row movie table (NOT shippable: changes training; an
             attribution probe)
  sg_aux   : aux heads consume stop_gradient(hidden)/stop_gradient(hist)
             — bounds the aux backward's coupling into the GRU chain
             (attribution probe)
  fold     : aux layer-1 folded into the main tower's fc1 and aux layer-2
             into fc2 as block-diagonal matmuls ([B, T-1, 2D] viewed as
             [B, (T-1)*2D], per-step weight repeated on the block
             diagonal) — 2 fewer matmuls per step, math-identical per
             element (MXU matmul-count lesson, 5th instance)

    python tools/dien_aux2.py          # on the TPU
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import DIEN, negative_cols
from sparrowrecsys_tpu.models.features import (
    GenreEmbed,
    IdEmbed,
    LinParams,
    PReLU,
    folded_dense,
    history_stack,
    numeric_stack,
)
from sparrowrecsys_tpu.ops.augru import AUGRUParams, augru, gru
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn

T = 5
ALPHA = 0.5


class DienExp(DIEN):
    """DIEN with the experiment switches. mode in
    {"base", "sg_neg", "sg_aux", "fold"} — base reproduces DIEN exactly
    (same param paths/inits via the parent helpers)."""

    mode: str = "base"

    @nn.compact
    def __call__(self, features):
        d = self.dim
        movie_emb = IdEmbed(
            self.movie_buckets, d, mask_zero=True, name="emb_movie_shared"
        )
        t = self.recent_movies
        hist_ids = history_stack(features, t)
        hist_mask = hist_ids > 0
        neg_ids = jnp.stack(
            [features[c] for c in negative_cols(t)], axis=-1
        )
        cand = movie_emb(features["movieId"])
        hist = movie_emb(hist_ids)
        neg = movie_emb(neg_ids)
        if self.mode == "sg_neg":
            neg = jax.lax.stop_gradient(neg)

        hidden = gru(
            self._gru_params("gru", d, d), hist, hist_mask, custom_vjp=False
        )
        prod = hidden * cand[:, None, :]
        att = nn.sigmoid(nn.Dense(32, name="att_dense32")(prod))
        att = nn.sigmoid(nn.Dense(1, name="att_dense1")(att))
        att = jnp.broadcast_to(att, hidden.shape)
        augru_params = AUGRUParams(
            r=self._augru_gate("augru_r", d),
            z=self._augru_gate("augru_z", d),
            h=self._augru_gate("augru_h", d),
        )
        interest = augru(augru_params, hidden, att, custom_vjp=False)

        user_profile = jnp.concatenate(
            [
                IdEmbed(self.user_buckets, d, name="emb_userId")(features["userId"]),
                GenreEmbed(dim=d, name="emb_userGenre1")(features["userGenre1"]),
                numeric_stack(
                    features, ("userRatingCount", "userAvgRating", "userRatingStddev")
                ),
            ],
            axis=-1,
        )
        context = jnp.concatenate(
            [
                GenreEmbed(dim=d, name="emb_movieGenre1")(features["movieGenre1"]),
                numeric_stack(
                    features,
                    ("releaseYear", "movieRatingCount", "movieAvgRating",
                     "movieRatingStddev"),
                ),
            ],
            axis=-1,
        )
        x = jnp.concatenate([interest, cand, user_profile, context], axis=-1)

        aux_hidden = hidden
        aux_hist = hist
        if self.mode == "sg_aux":
            aux_hidden = jax.lax.stop_gradient(hidden)
            aux_hist = jax.lax.stop_gradient(hist)
        pos_in = jnp.concatenate(
            [aux_hidden[:, : t - 1, :], aux_hist[:, 1:t, :]], axis=-1
        )
        neg_in = jnp.concatenate([aux_hidden[:, : t - 1, :], neg], axis=-1)

        # LinParams creates the exact nn.Dense param paths/inits, so every
        # mode shares DIEN's parameter tree.
        k_p1, b_p1 = LinParams(2 * d, 32, name="aux_pos32")()
        k_n1, b_n1 = LinParams(2 * d, 32, name="aux_neg32")()
        k_p2, b_p2 = LinParams(32, 1, name="aux_pos1")()
        k_n2, b_n2 = LinParams(32, 1, name="aux_neg1")()

        if self.mode == "fold":
            b = x.shape[0]
            f_dim = x.shape[-1]
            # Per-step aux layer-1 weight [4D, 64] (pos block -> cols :32,
            # neg block -> cols 32:), repeated (T-1) times on the block
            # diagonal NEXT TO fc1's kernel: one [B, F + (T-1)*4D] matmul
            # yields fc1's output and every step's aux h1 together.
            w_step = jnp.zeros((4 * d, 64), jnp.float32)
            w_step = jax.lax.dynamic_update_slice(w_step, k_p1, (0, 0))
            w_step = jax.lax.dynamic_update_slice(w_step, k_n1, (2 * d, 32))
            b_step = jnp.concatenate([b_p1, b_n1])  # [64]
            k_fc1, b_fc1 = LinParams(f_dim, 128, name="fc1")()
            rows = f_dim + (t - 1) * 4 * d
            cols = 128 + (t - 1) * 64
            big1 = jnp.zeros((rows, cols), jnp.float32)
            big1 = jax.lax.dynamic_update_slice(big1, k_fc1, (0, 0))
            for s in range(t - 1):
                big1 = jax.lax.dynamic_update_slice(
                    big1, w_step, (f_dim + s * 4 * d, 128 + s * 64)
                )
            bias1 = jnp.concatenate([b_fc1, jnp.tile(b_step, t - 1)])
            step_in = jnp.concatenate([pos_in, neg_in], axis=-1)  # [B,T-1,4D]
            y1 = (
                jnp.concatenate(
                    [x, step_in.reshape(b, (t - 1) * 4 * d)], axis=-1
                )
                @ big1
                + bias1
            )
            x1 = PReLU(name="prelu1")(y1[:, :128])
            h1 = nn.sigmoid(y1[:, 128:].reshape(b, t - 1, 64))

            # Layer-2 fold into fc2: per-step [64, 2] aux-out weight on
            # the block diagonal next to fc2's [128, 64] kernel.
            w2_step = jnp.zeros((64, 2), jnp.float32)
            w2_step = jax.lax.dynamic_update_slice(w2_step, k_p2, (0, 0))
            w2_step = jax.lax.dynamic_update_slice(w2_step, k_n2, (32, 1))
            b2_step = jnp.concatenate([b_p2, b_n2])  # [2]
            k_fc2, b_fc2 = LinParams(128, 64, name="fc2")()
            rows2 = 128 + (t - 1) * 64
            cols2 = 64 + (t - 1) * 2
            big2 = jnp.zeros((rows2, cols2), jnp.float32)
            big2 = jax.lax.dynamic_update_slice(big2, k_fc2, (0, 0))
            for s in range(t - 1):
                big2 = jax.lax.dynamic_update_slice(
                    big2, w2_step, (128 + s * 64, 64 + s * 2)
                )
            bias2 = jnp.concatenate([b_fc2, jnp.tile(b2_step, t - 1)])
            y2 = (
                jnp.concatenate([x1, h1.reshape(b, (t - 1) * 64)], axis=-1)
                @ big2
                + bias2
            )
            x2 = PReLU(name="prelu2")(y2[:, :64])
            pn = nn.sigmoid(y2[:, 64:].reshape(b, t - 1, 2))
        else:
            h1 = nn.sigmoid(
                folded_dense([pos_in, neg_in], [(k_p1, b_p1), (k_n1, b_n1)])
            )
            x1 = PReLU(name="prelu1")(
                folded_dense([x], [LinParams(x.shape[-1], 128, name="fc1")()])
            )
            pn = nn.sigmoid(
                folded_dense(
                    [h1[..., :32], h1[..., 32:]],
                    [(k_p2, b_p2), (k_n2, b_n2)],
                )
            )
            x2 = PReLU(name="prelu2")(
                folded_dense([x1], [LinParams(128, 64, name="fc2")()])
            )

        pos_p, neg_p = pn[..., 0], pn[..., 1]
        aux = jnp.sum(pos_p + neg_p, axis=1)
        logits = folded_dense([x2], [LinParams(64, 1, name="out")()])[..., 0]
        return logits, aux


def dien_loss(apply_fn, params, feats, labels, mask):
    """Reference aux semantics (dien_loss_fn 'reference'): BCE - 0.5*aux."""
    import optax

    logits, aux = apply_fn({"params": params}, feats)
    per_ex = optax.sigmoid_binary_cross_entropy(logits, labels) - ALPHA * aux
    return jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_epoch(model, mode, int_cols, flt_cols, n):
    """Packed pre-permuted scan epoch (step_exp8 harness). For 'ingraph'
    the negative columns are ABSENT from the packed matrices and sampled
    per step inside the scan: r ~ U[0, V-1), neg = r + (r >= pos) — the
    exact same distribution as add_dien_negatives (uniform excluding the
    same-column positive), one draw, no rejection loop."""
    steps = n // BATCH
    apply_fn = model.apply
    trainer = Trainer(model, TrainConfig(batch_size=BATCH, epochs=1),
                      loss_fn=lambda *a: (dien_loss(*a), (None, None)))

    @jax.jit
    def epoch(params, opt_state, int_mat, flt_mat, key):
        perm = jax.random.permutation(key, n)
        xi = int_mat[perm].reshape(steps, BATCH, -1)
        xf = flt_mat[perm].reshape(steps, BATCH, -1)

        def body(carry, x):
            p0, o0, step = carry
            feats = {k: x["i"][:, j] for j, k in enumerate(int_cols)}
            for j, k in enumerate(flt_cols):
                feats[k] = x["f"][:, j]
            labels = x["f"][:, -1]
            if mode == "ingraph":
                ks = jax.random.split(jax.random.fold_in(key, step), T - 1)
                for i, c in enumerate(negative_cols(T)):
                    pos = feats[f"userRatedMovie{i + 2}"]
                    r = jax.random.randint(ks[i], (BATCH,), 0, 1000,
                                           dtype=jnp.int32)
                    feats[c] = r + (r >= pos).astype(jnp.int32)
            mask = jnp.ones((BATCH,), jnp.float32)

            def lf(pp):
                return dien_loss(apply_fn, pp, feats, labels, mask)

            loss, grads = jax.value_and_grad(lf)(p0)
            upd, o1 = trainer.tx.update(grads, o0, p0)
            return (jax.tree.map(lambda a, u: a + u, p0, upd), o1, step + 1), loss

        (p1, o1, _), losses = jax.lax.scan(
            body, (params, opt_state, 0), {"i": xi, "f": xf}
        )
        return p1, o1, losses.sum()

    return trainer, epoch


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    all_int = sorted(k for k, v in data.items() if v.dtype == jnp.int32)
    flt_cols = sorted(k for k, v in data.items() if v.dtype != jnp.int32)
    no_neg_int = [c for c in all_int if not c.startswith("negative")]
    flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels_d], axis=1)
    int_mat_full = jnp.stack([data[k] for k in all_int], axis=1)
    int_mat_slim = jnp.stack([data[k] for k in no_neg_int], axis=1)

    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }

    # --- equality gate: fold mode == base mode, bitwise ------------------
    base_m = DienExp(mode="base")
    fold_m = DienExp(mode="fold")
    params = base_m.init(jax.random.PRNGKey(0),
                         {k: v[:256] for k, v in sample_host.items()})["params"]
    small = {k: np.asarray(v[:4096]) for k, v in data.items()}
    lb, ab = base_m.apply({"params": params}, small)
    lf_, af = fold_m.apply({"params": params}, small)
    dl = float(jnp.max(jnp.abs(lb - lf_)))
    da = float(jnp.max(jnp.abs(ab - af)))
    print(f"fold equality: max|dlogit|={dl:.3g} max|daux|={da:.3g}", flush=True)
    # Shipping DIEN == DienExp(base) (same param tree + math):
    ship = build_model("dien")
    ls, _ = ship.apply({"params": params}, small)
    print(f"base-vs-shipping max|dlogit|={float(jnp.max(jnp.abs(lb - ls))):.3g}",
          flush=True)

    variants = {
        "base": (DienExp(mode="base"), "base", int_mat_full, all_int),
        "ingraph": (DienExp(mode="base"), "ingraph", int_mat_slim, no_neg_int),
        "sg_neg": (DienExp(mode="sg_neg"), "base", int_mat_full, all_int),
        "sg_aux": (DienExp(mode="sg_aux"), "base", int_mat_full, all_int),
        "fold": (DienExp(mode="fold"), "base", int_mat_full, all_int),
    }
    runs = {}
    for name, (model, mode, imat, icols) in variants.items():
        trainer, ep = make_epoch(model, mode, icols, flt_cols, n)
        p = jax.device_put(params)
        o = trainer.tx.init(p)
        p, o, s = ep(p, o, imat, flt_mat, jax.random.PRNGKey(0))
        hard_sync(p)
        np.asarray(s)
        runs[name] = (ep, imat)
        print(f"{name}: compiled, loss={float(np.asarray(s)) / STEPS:.4f}",
              flush=True)

    tx = Trainer(DienExp(), TrainConfig(batch_size=BATCH, epochs=1)).tx
    best = {k: float("inf") for k in runs}
    for r in range(4):
        for name, (ep, imat) in runs.items():
            p = jax.device_put(params)
            o = tx.init(p)
            t0 = time.perf_counter()
            p, o, s = ep(p, o, imat, flt_mat, jax.random.PRNGKey(r + 1))
            hard_sync(p)
            np.asarray(s)
            best[name] = min(best[name], time.perf_counter() - t0)
    for name, b in best.items():
        print(f"{name:<8} {b/STEPS*1e3:7.3f} ms/step  {n/b/1e6:6.2f}M ex/s",
              flush=True)


if __name__ == "__main__":
    main()
