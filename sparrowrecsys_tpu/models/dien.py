"""DIEN (Deep Interest Evolution Network), rebuild of `TFRecModel/.../DIEN.py`.

Reference graph (DIEN.py:162-310):
- shared Embedding(1001, 10, mask_zero) over candidate / behaviour sequence
  / per-step negative movies (DIEN.py:173-178);
- GRU(10, return_sequences) over the behaviour embeddings (DIEN.py:181);
- attention: sigmoid Dense(32) -> Dense(1) over hidden*candidate, broadcast
  over the embedding dim (DIEN.py:184-213);
- AUGRU with attention-scaled update (DIEN.py:217-262) — `ops.augru.augru`
  restates the unrolled loop as `lax.scan`;
- towers + Dense(128)/PReLU/Dense(64)/PReLU/Dense(1, sigmoid) (DIEN.py:266-272);
- auxiliary head (DIEN.py:275-308): two sigmoid MLPs score
  (hidden_t, behaviour_{t+1}) and (hidden_t, negative_{t+1});
  reference loss = BCE(y, y_pred) - alpha * mean(sum_t(pos_t + neg_t)),
  alpha = 0.5.

`aux_mode` selects the loss semantics:
- "reference": the exact math above (it *rewards* large aux scores — a
  reference quirk, preserved as the parity default);
- "paper": the published DIEN auxiliary loss,
  -log(pos) - log(1 - neg), which is what the architecture intends;
- "none": the aux heads are STRUCTURALLY skipped — no aux params, no aux
  compute, aux output is a constant zero. (Setting alpha=0 does NOT
  remove the compute: XLA's algebraic simplifier won't fold float
  `0.0 * aux` because of NaN/Inf semantics — ADVICE r2 #1. Use this mode
  for inference towers and for honest cost attribution.)

Negative samples are generated in the data layer
(`sparrowrecsys_tpu.data.negatives.add_dien_negatives`) with a seeded JAX
RNG, replacing the pandas/random hack at DIEN.py:31-49.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import (
    GenreEmbed,
    IdEmbed,
    LinParams,
    PReLU,
    folded_dense,
    history_stack,
    numeric_stack,
)
from sparrowrecsys_tpu.ops.augru import (
    AUGRUGate,
    AUGRUParams,
    GRUParams,
    augru,
    gru,
)

def negative_cols(recent_movies: int = 5):
    """negativeUserRatedMovie2..T — one negative per non-initial history
    step (the reference uses columns 2..5 for T=5, DIEN.py:35-38)."""
    return tuple(
        f"negativeUserRatedMovie{k}" for k in range(2, recent_movies + 1)
    )


#: reference-parity constant (T=5)
NEGATIVE_COLS = negative_cols(5)


class DIEN(nn.Module):
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    aux_mode: str = "reference"  # or "paper"
    alpha: float = 0.5
    #: tower widths fc1=hidden, fc2=hidden//2 (reference 128/64,
    #: DIEN.py:266-272); scalable for production-shape MFU configs.
    hidden: int = 128
    #: dtype for the fc towers and attention (recurrences stay fp32 —
    #: GRU/AUGRU state feedback is precision-sensitive and scan-bound,
    #: not MXU-bound; the towers are where bf16 buys MXU rate).
    compute_dtype: str = "float32"
    #: aux aggregation over history steps (paper mode only). "sum" is the
    #: published form (DIEN.py:297-305 sums over T) — which couples the
    #: aux term's effective weight to HISTORY LENGTH: at T=64 the summed
    #: aux is ~13x the T=5 term at the same alpha, which is how
    #: paper@0.5 pinned T=64 DIEN to chance (BASELINE.md r4 alpha curve).
    #: "mean" divides by the per-example count of valid steps so alpha
    #: means the same thing at any T (VERDICT r4 #3a).
    aux_norm: str = "sum"
    #: behaviour-sequence length (5 = reference parity; the GRU/AUGRU are
    #: lax.scan, so any T compiles without unrolling)
    recent_movies: int = 5
    #: candidate+history+negatives as one [B, 2T] gather of the shared table
    #: vs three separate gathers. Bitwise-identical outputs, but measured
    #: 23% SLOWER in the full train step (tools/step_exp11.py, v5e, batch
    #: 65536: 11.55 vs 9.35 ms/step) — the [B, 2T, D] result feeds three
    #: differently-shaped consumers (GRU xs, aux shift, AUGRU) and its
    #: backward concentrates into one wide scatter, which XLA schedules
    #: worse than the three fused lookups. Default stays False; DIN keeps
    #: its merged [B, T+1] gather (measured +1.6% there, where candidate
    #: and history feed the same attention block).
    merged_gather: bool = False
    #: route GRU/AUGRU through the hand-written recurrence backward (weight
    #: grads as one stacked [T*B, H] matmul outside the scan — see
    #: ops/augru.py). Measured a WASH at the bench config (0.967x,
    #: tools/dien_vjp_exp.py, v5e batch 65536: the in-scan dW matmuls the
    #: custom path removes cost about what its residual stacking adds) —
    #: default stays the lax.scan autodiff per the repo's dispatch
    #: convention; the custom path ships tested for revisit at larger H/T.
    recurrence_custom_vjp: bool = False
    #: rematerialize the GRU/AUGRU scan bodies in the backward pass
    #: (ops/augru.py remat=True): drops the per-step gate-activation
    #: residual stacks ([T, B, H] x 6 across both recurrences) at the
    #: cost of one extra gate evaluation per backward step. Measured on
    #: v5e at the production shape (dim 128, batch 16384, T=64): BOTH
    #: the memory unlock (dien_paper compiled at a batch that OOMed:
    #: 16.26 G needed of 15.75 G) AND 1.37x faster (aux-none 207 vs
    #: 285 ms/step — the dropped stacks were HBM traffic). None = auto:
    #: on at T >= 64 (the measured shape), off below it (reference
    #: shapes T=5: stacks are tiny, remat only adds recompute;
    #: T in [16, 64) unmeasured — set explicitly to override).
    #: BASELINE.md round-5 DIEN memory section.
    recurrence_remat: Optional[bool] = None
    #: bf16 cast-before-gather for the shared movie table + user table
    #: (fp32 master params; quality-neutral per the Zipf A/B,
    #: BASELINE.md bf16-lookup section). Recurrence inputs get cast to
    #: fp32 at the GRU (state feedback stays fp32). None = param dtype.
    lookup_dtype: Optional[str] = None

    def _gru_params(self, name: str, in_dim: int, h_dim: int) -> GRUParams:
        return GRUParams(
            kernel=self.param(
                f"{name}_kernel", nn.initializers.lecun_normal(), (in_dim, 3 * h_dim)
            ),
            recurrent=self.param(
                f"{name}_recurrent", nn.initializers.orthogonal(), (h_dim, 3 * h_dim)
            ),
            bias=self.param(f"{name}_bias", nn.initializers.zeros, (3 * h_dim,)),
        )

    def _augru_gate(self, name: str, h_dim: int) -> AUGRUGate:
        return AUGRUGate(
            w=self.param(
                f"{name}_w", nn.initializers.lecun_normal(), (h_dim, h_dim)
            ),
            b=self.param(f"{name}_b", nn.initializers.zeros, (h_dim,)),
            u=self.param(
                f"{name}_u", nn.initializers.lecun_normal(), (h_dim, h_dim)
            ),
        )

    @nn.compact
    def __call__(
        self, features: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits [B], aux [B]) — aux is the per-example auxiliary
        term to combine per `aux_mode` (see `dien_loss`)."""
        d = self.dim
        movie_emb = IdEmbed(
            self.movie_buckets, d, mask_zero=True,
            name="emb_movie_shared", lookup_dtype=self.lookup_dtype,
        )
        t = self.recent_movies
        hist_ids = history_stack(features, t)                       # [B, T]
        remat = (
            self.recurrence_remat
            if self.recurrence_remat is not None
            else t >= 64
        )
        hist_mask = hist_ids > 0
        # Candidate + history + negative history can ride ONE [B, 2T]
        # gather of the shared table instead of three (see din.py /
        # features.py merged_embed_bias rationale; bitwise identical).
        if self.aux_mode == "none":
            # No aux heads -> no negative-history columns required AND no
            # neg gather in the graph at all. (An earlier version gathered
            # a zero-id [B, T-1] block here and let XLA fold it; the
            # zero-broadcast buffers seen in the batch-65536 OOM dump were
            # initially blamed on it, but the A/B REFUTED that: the skip
            # changed the 52.3 GB HLO-temp requirement by ~nothing — the
            # memory is recurrence-backward residual stacks (remat saves
            # 21 GB, BASELINE.md round-5 DIEN memory section). The skip
            # stays as the structurally right graph: no dead gather.)
            neg_ids = None
        else:
            neg_ids = jnp.stack(
                [features[c] for c in negative_cols(t)], axis=-1
            )
        if self.merged_gather:
            blocks = [features["movieId"][:, None], hist_ids]
            if neg_ids is not None:
                blocks.append(neg_ids)
            chn = movie_emb(jnp.concatenate(blocks, axis=1))         # [B, <=2T, D]
            cand = chn[:, 0]
            hist = chn[:, 1 : t + 1]
            neg = chn[:, t + 1 :] if neg_ids is not None else None
        else:
            cand = movie_emb(features["movieId"])                    # [B, D]
            hist = movie_emb(hist_ids)                               # [B, T, D]
            neg = movie_emb(neg_ids) if neg_ids is not None else None

        # Masked GRU: padded steps carry state (Keras mask_zero parity).
        hidden = gru(
            self._gru_params("gru", d, d),
            hist,
            hist_mask,
            custom_vjp=self.recurrence_custom_vjp,
            remat=remat,
        )                                                            # [B, T, D]

        # Attention (DIEN.py:184-213): product with repeated candidate ->
        # Dense(32, sigmoid) -> Dense(1, sigmoid) -> broadcast to [B, 5, D].
        prod = hidden * cand[:, None, :]
        att = nn.sigmoid(nn.Dense(32, name="att_dense32")(prod))
        att = nn.sigmoid(nn.Dense(1, name="att_dense1")(att))       # [B, 5, 1]
        att = jnp.broadcast_to(att, hidden.shape)                   # [B, 5, D]

        augru_params = AUGRUParams(
            r=self._augru_gate("augru_r", d),
            z=self._augru_gate("augru_z", d),
            h=self._augru_gate("augru_h", d),
        )
        interest = augru(
            augru_params,
            hidden,
            att,
            custom_vjp=self.recurrence_custom_vjp,
            remat=remat,
        )                                                            # [B, D]

        user_profile = jnp.concatenate(
            [
                IdEmbed(self.user_buckets, d, name="emb_userId",
                        lookup_dtype=self.lookup_dtype)(features["userId"]),
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
                    (
                        "releaseYear",
                        "movieRatingCount",
                        "movieAvgRating",
                        "movieRatingStddev",
                    ),
                ),
            ],
            axis=-1,
        )

        from sparrowrecsys_tpu.models.features import compute_dtype

        dt = compute_dtype(self.compute_dtype)
        x = jnp.concatenate([interest, cand, user_profile, context], axis=-1)
        x = PReLU(name="prelu1")(
            nn.Dense(self.hidden, dtype=dt, name="fc1")(x).astype(jnp.float32)
        )
        x = PReLU(name="prelu2")(
            nn.Dense(self.hidden // 2, dtype=dt, name="fc2")(x).astype(
                jnp.float32
            )
        )
        logits = nn.Dense(1, name="out")(x)[..., 0]

        if self.aux_mode == "none":
            # Structural skip: no aux params, no aux compute (alpha=0
            # would NOT DCE the heads — ADVICE r2 #1).
            return logits, jnp.zeros_like(logits)

        # Auxiliary head (DIEN.py:275-308): hidden[:, :T-1] vs next-step
        # positive hist[:, 1:T] and negative neg[:, :T-1]. The pos/neg
        # heads fold into block-diagonal matmuls at both layers (2 matmuls
        # instead of 4 — MXU K-padding lesson, see features.LinParams;
        # param paths/inits are nn.Dense's, numbers identical).
        pos_in = jnp.concatenate(
            [hidden[:, : t - 1, :], hist[:, 1:t, :]], axis=-1
        )
        neg_in = jnp.concatenate([hidden[:, : t - 1, :], neg], axis=-1)
        h1 = nn.sigmoid(
            folded_dense(
                [pos_in, neg_in],
                [
                    LinParams(2 * d, 32, name="aux_pos32")(),
                    LinParams(2 * d, 32, name="aux_neg32")(),
                ],
            )
        )                                                    # [B, T-1, 64]
        pn = nn.sigmoid(
            folded_dense(
                [h1[..., :32], h1[..., 32:]],
                [
                    LinParams(32, 1, name="aux_pos1")(),
                    LinParams(32, 1, name="aux_neg1")(),
                ],
            )
        )                                                    # [B, T-1, 2]
        pos_p, neg_p = pn[..., 0], pn[..., 1]

        if self.aux_mode == "paper":
            # Published DIEN aux loss, masked to steps whose next-step
            # positive actually exists (pad steps would otherwise train the
            # heads on zero-embedding inputs).
            eps = 1e-7
            step_valid = hist_mask[:, 1:t].astype(pos_p.dtype)      # [B, T-1]
            aux = -jnp.sum(
                (jnp.log(pos_p + eps) + jnp.log(1.0 - neg_p + eps))
                * step_valid,
                axis=1,
            )
            if self.aux_norm == "mean":
                # Per-step mean: decouple alpha from T (see field doc).
                aux = aux / jnp.maximum(jnp.sum(step_valid, axis=1), 1.0)
        else:
            # Reference parity: unmasked sum (DIEN.py:297-305 has no mask).
            aux = jnp.sum(pos_p + neg_p, axis=1)
        return logits, aux


def sample_negatives_in_graph(
    key, feats: Dict[str, jnp.ndarray], recent_movies: int = 5,
    movie_vocab: int = MOVIE_VOCAB_SIZE,
) -> Dict[str, jnp.ndarray]:
    """Per-step uniform negatives sampled INSIDE the compiled step.

    Distribution-identical to `data.negatives.add_dien_negatives` (uniform
    over [0, vocab) excluding the same-column positive — the reference's
    semantics, DIEN.py:31-49) via a single draw: r ~ U[0, vocab-1),
    neg = r + (r >= pos). No rejection loop, no data columns: the 4
    negativeUserRatedMovie columns leave the packed epoch matrices
    entirely, which measured +6.2% on the DIEN train step
    (tools/dien_aux2.py, v5e batch 65536, interleaved A/B) — and unlike
    fixed data-layer columns the negatives RESAMPLE every epoch (the
    paper's per-batch sampling, a strict statistical superset of the
    reference's one-shot draw)."""
    import jax

    out = dict(feats)
    ks = jax.random.split(key, recent_movies - 1)
    for i, col in enumerate(negative_cols(recent_movies)):
        pos = feats[f"userRatedMovie{i + 2}"]
        r = jax.random.randint(
            ks[i], pos.shape, 0, movie_vocab - 1, dtype=jnp.int32
        )
        out[col] = r + (r >= pos).astype(jnp.int32)
    return out


def dien_loss_fn(
    alpha: float = 0.5,
    aux_mode: str = "reference",
    in_graph_negatives: bool = False,
    recent_movies: int = 5,
    movie_vocab: int = MOVIE_VOCAB_SIZE,
):
    """Trainer-compatible loss for DIEN's two-headed output.

    Reference semantics (DIEN.py:303-305): mean BCE - alpha * mean(aux);
    paper semantics: mean BCE + alpha * mean(aux) where aux is the proper
    -log(pos) - log(1-neg) term (selected by the model's own aux_mode —
    keep both in sync).

    in_graph_negatives=True samples the negativeUserRatedMovie columns
    inside the step from a per-step PRNG key the Trainer threads in
    (`wants_rng` protocol) instead of reading data columns — see
    `sample_negatives_in_graph`. The training dataset then needs no
    negative columns; the EVAL set still does (the eval path has no rng —
    keep `add_dien_negatives` on test data).
    """
    import optax

    sign = 1.0 if aux_mode == "paper" else -1.0

    def fn(apply_fn, params, feats, labels, mask, key=None):
        if in_graph_negatives and aux_mode != "none":
            feats = sample_negatives_in_graph(
                key, feats, recent_movies, movie_vocab
            )
        logits, aux = apply_fn({"params": params}, feats)
        bce = optax.sigmoid_binary_cross_entropy(logits, labels)
        if aux_mode == "none":
            per_ex = bce  # structural: no aux term in the graph at all
        else:
            per_ex = bce + sign * alpha * aux
        loss = jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        # Report the FULL optimized objective as the loss metric (Keras
        # reports the compiled loss incl. add_loss terms) — reporting bare
        # BCE would mask aux-head divergence.
        return loss, (logits, jnp.sum(per_ex * mask))

    fn.wants_rng = bool(in_graph_negatives)
    if in_graph_negatives:
        # Shape-inference helper for Trainer.init_params: the train data
        # carries no negative columns in this mode, but model.init still
        # needs them to trace the graph.
        import jax

        fn.prepare_init_features = lambda feats: (
            sample_negatives_in_graph(
                jax.random.PRNGKey(0), feats, recent_movies, movie_vocab
            )
        )
    return fn
