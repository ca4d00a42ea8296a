"""DIN (Deep Interest Network), rebuild of `TFRecModel/.../DIN.py`.

Reference (DIN.py:97-172):
- shared Embedding(1001, 10, mask_zero=True) over candidate movieId and the
  5-step behaviour sequence userRatedMovie1..5 (DIN.py:137-141);
- activation unit: concat([hist - cand, hist, cand, hist * cand]) ->
  Dense(32) -> PReLU -> Dense(1, sigmoid) -> weights x hist -> sum-pool
  (DIN.py:144-163), fused here via `ops.attention.din_attention`;
- towers: user profile = [user emb, userGenre1 emb, 3 user numerics],
  context = [movieGenre1 emb, 4 movie numerics] (DIN.py:113-127);
- concat(profile, pooled interest, candidate emb, context) -> Dense(128)
  -> PReLU -> Dense(64) -> PReLU -> Dense(1, sigmoid) (DIN.py:166-172).

Deliberate fix (documented, SURVEY.md §7 "quirks"): the reference's Keras
mask from `mask_zero=True` is dropped by the Lambda sum-pool, so padded
steps leak row-0 embeddings into the pooled interest; here masked steps
contribute exactly zero (`IdEmbed(mask_zero=True)` zeroes them and the
attention weights are masked on zero embeddings).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import (
    GenreEmbed,
    IdEmbed,
    PReLU,
    compute_dtype,
    history_stack,
    numeric_stack,
)
from sparrowrecsys_tpu.ops.attention import din_attention


class DIN(nn.Module):
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    attention_hidden: int = 32
    compute_dtype: str = "float32"
    #: bf16 cast-before-gather for the big id tables (fp32 master
    #: params; quality-neutral per the Zipf A/B, BASELINE.md
    #: bf16-lookup section). None = param dtype. For the sequence
    #: models this halves the HISTORY row traffic — the measured
    #: binding resource of the DIN T=64 production row.
    lookup_dtype: str | None = None
    #: behaviour-sequence length; 5 = reference parity (`DIN.py:31`),
    #: larger values consume build_samples(history_length=N) columns.
    #: XLA is the measured default at every T (KERNELS.md); the fused
    #: Pallas attention is opt-in via use_pallas=True.
    recent_movies: int = 5
    use_pallas: Optional[bool] = None  # None = measured auto-dispatch
    #: tower widths fc1=hidden, fc2=hidden//2 (reference 128/64,
    #: DIN.py:166-172); scalable for production-shape MFU configs.
    hidden: int = 128

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        movie_emb = IdEmbed(
            self.movie_buckets, self.dim, mask_zero=True,
            name="emb_movie_shared", lookup_dtype=self.lookup_dtype,
        )
        # Candidate rides the history gather: ONE [B, T+1] lookup of the
        # shared table instead of two (random gathers are the step's cost
        # on TPU — see merged_embed_bias in features.py; bitwise
        # identical, both lookups were mask_zero through this module).
        ch = movie_emb(
            jnp.concatenate(
                [
                    features["movieId"][:, None],
                    history_stack(features, self.recent_movies),
                ],
                axis=1,
            )
        )                                              # [B, T+1, D]
        cand, hist = ch[:, 0], ch[:, 1:]

        w1 = self.param(
            "att_w1", nn.initializers.lecun_normal(), (4 * self.dim, self.attention_hidden)
        )
        b1 = self.param("att_b1", nn.initializers.zeros, (self.attention_hidden,))
        alpha = self.param("att_prelu", nn.initializers.zeros, (self.attention_hidden,))
        w2 = self.param(
            "att_w2", nn.initializers.lecun_normal(), (self.attention_hidden, 1)
        )
        b2 = self.param("att_b2", nn.initializers.zeros, (1,))
        pooled = din_attention(
            hist, cand, w1, b1, alpha, w2, b2, use_pallas=self.use_pallas
        )  # [B, D]

        user_profile = jnp.concatenate(
            [
                IdEmbed(self.user_buckets, self.dim, name="emb_userId",
                        lookup_dtype=self.lookup_dtype)(
                    features["userId"]
                ),
                GenreEmbed(dim=self.dim, name="emb_userGenre1")(features["userGenre1"]),
                numeric_stack(
                    features, ("userRatingCount", "userAvgRating", "userRatingStddev")
                ),
            ],
            axis=-1,
        )
        context = jnp.concatenate(
            [
                GenreEmbed(dim=self.dim, name="emb_movieGenre1")(
                    features["movieGenre1"]
                ),
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

        dt = compute_dtype(self.compute_dtype)
        x = jnp.concatenate([user_profile, pooled, cand, context], axis=-1)
        x = PReLU(name="prelu1")(
            nn.Dense(self.hidden, dtype=dt, name="fc1")(x).astype(jnp.float32)
        )
        x = PReLU(name="prelu2")(
            nn.Dense(self.hidden // 2, dtype=dt, name="fc2")(x).astype(
                jnp.float32
            )
        )
        return nn.Dense(1, name="out")(x)[..., 0]
