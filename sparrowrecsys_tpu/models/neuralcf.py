"""NeuralCF, rebuild of `TFRecModel/.../NeuralCF.py`.

Two architectures (NeuralCF.py:46-78):
- `NeuralCF` (arch 1, the one the reference instantiates at line 83 and
  exports as the TF-Serving `recmodel`): concat(movie emb, user emb) ->
  MLP hidden [10, 10] relu -> Dense(1, sigmoid).
- `NeuralCFTwoTower` (arch 2): per-tower MLPs over each embedding ->
  dot product -> Dense(1, sigmoid). The towers are the retrieval-plane
  item/user encoders (SURVEY.md §7 step 6) — `item_tower`/`user_tower`
  methods expose them for on-TPU top-k retrieval.

Inputs: ids only (`NeuralCF.py:38-41`).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import IdEmbed


class NeuralCF(nn.Module):
    hidden: Sequence[int] = (10, 10)
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        item = IdEmbed(self.movie_buckets, self.dim, name="emb_movieId")(
            features["movieId"]
        )
        user = IdEmbed(self.user_buckets, self.dim, name="emb_userId")(
            features["userId"]
        )
        x = jnp.concatenate([item, user], axis=-1)
        for i, n in enumerate(self.hidden):
            x = nn.relu(nn.Dense(n, name=f"interact{i}")(x))
        return nn.Dense(1, name="out")(x)[..., 0]


class NeuralCFTwoTower(nn.Module):
    hidden: Sequence[int] = (10, 10)
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE

    def setup(self):
        self.emb_movie = IdEmbed(self.movie_buckets, self.dim, name="emb_movieId")
        self.emb_user = IdEmbed(self.user_buckets, self.dim, name="emb_userId")
        self.item_layers = [
            nn.Dense(n, name=f"item{i}") for i, n in enumerate(self.hidden)
        ]
        self.user_layers = [
            nn.Dense(n, name=f"user{i}") for i, n in enumerate(self.hidden)
        ]
        self.out = nn.Dense(1, name="out")

    def item_tower(self, movie_ids: jnp.ndarray) -> jnp.ndarray:
        x = self.emb_movie(movie_ids)
        for layer in self.item_layers:
            x = nn.relu(layer(x))
        return x

    def user_tower(self, user_ids: jnp.ndarray) -> jnp.ndarray:
        x = self.emb_user(user_ids)
        for layer in self.user_layers:
            x = nn.relu(layer(x))
        return x

    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        item = self.item_tower(features["movieId"])
        user = self.user_tower(features["userId"])
        dot = jnp.sum(item * user, axis=-1, keepdims=True)
        return self.out(dot)[..., 0]
