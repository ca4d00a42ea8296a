"""Embedding MLP ("Deep Crossing"-style), rebuild of
`TFRecModel/.../EmbeddingMLP.py`.

Reference architecture (EmbeddingMLP.py:46-84): DenseFeatures over
7 numerics + 8 per-column genre embeddings (19-vocab, dim 10) + movieId
embedding (1001x10) + userId embedding (30001x10), then
Dense(128, relu) x 2 -> Dense(1, sigmoid).

This module emits logits; sigmoid lives in the loss/serving layer.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import (
    GENRE_COLS,
    GenreEmbed,
    IdEmbed,
    compute_dtype,
    numeric_stack,
)


class EmbeddingMLP(nn.Module):
    hidden: int = 128
    compute_dtype: str = "float32"
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    #: cast the id tables to this dtype BEFORE the gather (fp32 master
    #: weights; halves the bytes-bound random-row traffic — measured
    #: −6 ms/step at the MFU shape, BASELINE.md). None = param dtype.
    lookup_dtype: str | None = None

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        parts = [numeric_stack(features)]
        for col in GENRE_COLS:
            parts.append(GenreEmbed(dim=self.dim, name=f"emb_{col}")(features[col]))
        parts.append(
            IdEmbed(self.movie_buckets, self.dim, name="emb_movieId",
                    lookup_dtype=self.lookup_dtype)(features["movieId"])
        )
        parts.append(
            IdEmbed(self.user_buckets, self.dim, name="emb_userId",
                    lookup_dtype=self.lookup_dtype)(features["userId"])
        )
        dt = compute_dtype(self.compute_dtype)
        x = jnp.concatenate(parts, axis=-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=dt, name="dense1")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=dt, name="dense2")(x))
        return nn.Dense(1, name="out")(x.astype(jnp.float32))[..., 0]
