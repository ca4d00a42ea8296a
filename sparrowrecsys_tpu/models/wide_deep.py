"""Wide&Deep, rebuild of `TFRecModel/.../WideNDeep.py`.

Reference (WideNDeep.py:73-114): deep = DenseFeatures(7 numerics + 8 genre
embeddings + movie/user id embeddings) -> Dense(128,relu) x2; wide =
indicator(crossed_column([movieId, userRatedMovie1], hash_bucket=10000));
concat(deep, wide) -> Dense(1, sigmoid).

TPU-native note: the 10000-dim one-hot indicator feeding the final Dense(1)
is mathematically a per-bucket scalar weight — implemented here as a 1-d
embedding gather (`IdBias`) instead of materializing a [B, 10000] one-hot,
saving ~40 KB of HBM traffic per example. The crossed-column hash matches
TF's `crossed_column` semantics in distribution (deterministic hash of the
id pair into 10000 buckets); the exact fingerprint function differs, which
only permutes bucket assignment and cannot move AUC.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, MOVIE_VOCAB_SIZE, USER_VOCAB_SIZE
from sparrowrecsys_tpu.models.features import (
    GENRE_COLS,
    GenreEmbed,
    IdBias,
    IdEmbed,
    compute_dtype,
    numeric_stack,
)


def cross_hash(a: jnp.ndarray, b: jnp.ndarray, buckets: int) -> jnp.ndarray:
    """Deterministic hash of an id pair into [0, buckets).

    Fills the role of TF's FarmHash-based `crossed_column` (WideNDeep.py:75)
    with a cheap on-device mix (two rounds of multiply-xor-shift on uint32).
    """
    x = a.astype(jnp.uint32) * jnp.uint32(2654435761) ^ b.astype(jnp.uint32)
    x = x * jnp.uint32(2246822519)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(3266489917)
    x = x ^ (x >> 16)
    return (x % jnp.uint32(buckets)).astype(jnp.int32)


class WideNDeep(nn.Module):
    hidden: int = 128
    compute_dtype: str = "float32"
    #: bf16 cast-before-gather for the big id tables (fp32 master
    #: params; quality-neutral per the Zipf A/B, BASELINE.md
    #: bf16-lookup section). None = param dtype.
    lookup_dtype: str | None = None
    dim: int = EMBEDDING_DIM
    movie_buckets: int = MOVIE_VOCAB_SIZE
    user_buckets: int = USER_VOCAB_SIZE
    cross_buckets: int = 10000

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
        deep = jnp.concatenate(parts, axis=-1)
        deep = nn.relu(nn.Dense(self.hidden, dtype=dt, name="deep1")(deep))
        deep = nn.relu(nn.Dense(self.hidden, dtype=dt, name="deep2")(deep))
        deep = deep.astype(jnp.float32)

        crossed = cross_hash(
            features["movieId"], features["userRatedMovie1"], self.cross_buckets
        )
        wide = IdBias(self.cross_buckets, name="wide_cross")(crossed)

        logit = nn.Dense(1, name="out")(deep)[..., 0] + wide
        return logit
