"""DeepFM v1 and v2, rebuilds of `TFRecModel/.../DeepFM.py` and `DeepFM_v2.py`.

v1 (DeepFM.py:56-118):
- first order: indicator one-hots of movieId/userId/userGenre1/movieGenre1
  feeding the final Dense(1) — here folded into per-bucket bias gathers
  (`IdBias`), numerically identical and gather-cheap on TPU.
- second order: 4 pairwise dot products of {movie, user, movieGenre1,
  userGenre1} embeddings (movie/user tables SHARED with the deep tower,
  as the reference reuses the same feature-column objects).
- deep: 7 numerics + movie emb + user emb -> Dense(64, relu) x 2.
- concat(first, dots, deep) -> Dense(1, sigmoid).

v2 (DeepFM_v2.py:99-159) — true FM cross:
- first order: Dense(1) over cat one-hots (-> IdBias sum) + Dense(1) over
  7 numerics, added.
- fields: 4 embeddings + the numeric vector, each projected by its own
  Dense(64) -> stacked [B, 5, 64].
- FM second order: sum-square minus square-sum over the field axis — the
  classic O(F*D) FM identity; `sparrowrecsys_tpu.ops.fm.fm_cross` provides
  the fused Pallas kernel with an XLA fallback.
- deep: flattened fields -> Dense(32, relu) -> Dense(16, relu).
- concat(first, fm, deep) -> Dense(1, sigmoid).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import (
    GenreEmbed,
    IdBias,
    IdEmbed,
    LinParams,
    compute_dtype,
    folded_projections,
    merged_embed_bias,
    numeric_stack,
)
from sparrowrecsys_tpu.ops.fm import fm_cross


class DeepFM(nn.Module):
    """DeepFM v1 — pairwise-dot FM."""

    deep_hidden: int = 64
    compute_dtype: str = "float32"
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    #: cast the big id tables (+their bias columns via the merge) to
    #: this dtype BEFORE the gather — fp32 master params, halved
    #: random-row bytes on the model's BINDING resource (the zoo MFU
    #: table measured both deepfm variants embedding-bound at 13-14%).
    #: Quality-neutral per the Zipf A/B (BASELINE.md bf16-lookup).
    lookup_dtype: str | None = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        # Each id column's embedding and first-order bias ride ONE gather
        # (merged_embed_bias: +72% full-step, bitwise identical; param
        # paths are those of the unfused modules).
        item, b_item = merged_embed_bias(
            IdEmbed(self.movie_buckets, self.dim, name="emb_movieId",
                    lookup_dtype=self.lookup_dtype)(None),
            IdBias(self.movie_buckets, name="bias_movieId")(None),
            features["movieId"],
        )
        user, b_user = merged_embed_bias(
            IdEmbed(self.user_buckets, self.dim, name="emb_userId",
                    lookup_dtype=self.lookup_dtype)(None),
            IdBias(self.user_buckets, name="bias_userId")(None),
            features["userId"],
        )
        item_genre, b_mg = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_movieGenre1")(None),
            IdBias(19, name="bias_movieGenre1")(None),
            features["movieGenre1"],
        )
        user_genre, b_ug = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_userGenre1")(None),
            IdBias(19, name="bias_userGenre1")(None),
            features["userGenre1"],
        )

        # First-order: per-bucket scalar weights of the indicator columns.
        first = b_item + b_user + b_ug + b_mg

        # Second-order pairwise dots (DeepFM.py:93-106).
        dots = jnp.stack(
            [
                jnp.sum(item * user, axis=-1),
                jnp.sum(item_genre * user_genre, axis=-1),
                jnp.sum(item_genre * user, axis=-1),
                jnp.sum(item * user_genre, axis=-1),
            ],
            axis=-1,
        )

        dt = compute_dtype(self.compute_dtype)
        deep = jnp.concatenate([numeric_stack(features), item, user], axis=-1)
        deep = nn.relu(nn.Dense(self.deep_hidden, dtype=dt, name="deep1")(deep))
        deep = nn.relu(nn.Dense(self.deep_hidden, dtype=dt, name="deep2")(deep))
        deep = deep.astype(jnp.float32)

        x = jnp.concatenate([dots, deep], axis=-1)
        return nn.Dense(1, name="out")(x)[..., 0] + first


class DeepFMv2(nn.Module):
    """DeepFM v2 — full FM cross via sum-square minus square-sum."""

    field_dim: int = 64
    compute_dtype: str = "float32"
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    #: cast the big id tables (+their bias columns via the merge) to
    #: this dtype BEFORE the gather — fp32 master params, halved
    #: random-row bytes on the model's BINDING resource (the zoo MFU
    #: table measured both deepfm variants embedding-bound at 13-14%).
    #: Quality-neutral per the Zipf A/B (BASELINE.md bf16-lookup).
    lookup_dtype: str | None = None
    #: deep tower widths deep1=deep_hidden, deep2=deep_hidden//2
    #: (reference 32/16, DeepFM_v2.py:126-128); scalable for
    #: production-shape MFU configs.
    deep_hidden: int = 32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        # Merged emb+bias gathers — see DeepFM above / merged_embed_bias.
        item, b_item = merged_embed_bias(
            IdEmbed(self.movie_buckets, self.dim, name="emb_movieId",
                    lookup_dtype=self.lookup_dtype)(None),
            IdBias(self.movie_buckets, name="bias_movieId")(None),
            features["movieId"],
        )
        user, b_user = merged_embed_bias(
            IdEmbed(self.user_buckets, self.dim, name="emb_userId",
                    lookup_dtype=self.lookup_dtype)(None),
            IdBias(self.user_buckets, name="bias_userId")(None),
            features["userId"],
        )
        item_genre, b_mg = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_movieGenre1")(None),
            IdBias(19, name="bias_movieGenre1")(None),
            features["movieGenre1"],
        )
        user_genre, b_ug = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_userGenre1")(None),
            IdBias(19, name="bias_userGenre1")(None),
            features["userGenre1"],
        )
        numerics = numeric_stack(features)

        first = (
            b_item + b_user + b_ug + b_mg
            + nn.Dense(1, name="first_deep")(numerics)[..., 0]
        )

        # Per-field Dense(64) projections -> [B, 5, 64] (DeepFM_v2.py:107-128),
        # folded into ONE block-diagonal matmul: five K<=10 nn.Dense calls
        # each waste the MXU's 128-lane K padding — the fold measured +3.9%
        # on the full train step (tools/fold_exp.py). Param paths/inits are
        # nn.Dense's exactly (LinParams), so checkpoints and seed-pinned
        # bands are unchanged; outputs bitwise-equal (asserted in
        # tests/test_models.py::test_deepfm_v2_folded_projection_math).
        xs = [item_genre, item, user_genre, user, numerics]
        kbs = [
            LinParams(x.shape[-1], self.field_dim, name=n)()
            for n, x in zip(
                ("proj_itemGenre", "proj_item", "proj_userGenre",
                 "proj_user", "proj_numeric"),
                xs,
            )
        ]
        fields = folded_projections(xs, kbs, self.field_dim)

        fm = fm_cross(fields)  # [B, 64]

        dt = compute_dtype(self.compute_dtype)
        deep = fields.reshape(fields.shape[0], -1)
        deep = nn.relu(nn.Dense(self.deep_hidden, dtype=dt, name="deep1")(deep))
        deep = nn.relu(
            nn.Dense(self.deep_hidden // 2, dtype=dt, name="deep2")(deep)
        )
        deep = deep.astype(jnp.float32)

        x = jnp.concatenate([first[:, None], fm, deep], axis=-1)
        return nn.Dense(1, name="out")(x)[..., 0]
