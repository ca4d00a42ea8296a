"""Synthetic large-scale datasets for stress and scaling benchmarks.

The driver environment has zero egress, so MovieLens-20M cannot be
downloaded; this module generates datasets with 20M-class shape
(BASELINE.md targets: 138k+ users, 27k+ movies, tens of millions of
events) and a planted low-rank taste structure so AUC/recall metrics
remain meaningful. Used by bench.py's scaling modes and the
sharded-embedding stress tests (SURVEY.md §2.7: sharding MovieLens-small
is mechanism demonstration; synthetic vocabs make it load-bearing).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.data.movielens import Ratings


@dataclasses.dataclass(frozen=True)
class SyntheticSpec:
    n_users: int = 138_000     # MovieLens-20M scale
    n_movies: int = 27_000
    n_events: int = 1_000_000  # dial up for 20M-class runs
    latent_dim: int = 8
    #: per-user / per-movie rating-bias scales. Real MovieLens has strong
    #: marginal structure (grumpy raters, acclaimed movies) — without it
    #: every engineered movie/user statistic is pure noise by construction
    #: and the only learnable signal is the factorization itself, which
    #: caps at-scale AUC near chance (the r1 run's 0.528). 0.5/0.4 puts
    #: the marginal:interaction variance ratio in MovieLens' ballpark.
    user_bias_scale: float = 0.5
    movie_bias_scale: float = 0.4
    #: mean rating. 3.0 ~ half the catalog clears the 3.5 positive line
    #: (MovieLens-like CTR base rate); lower it to make positives RARE and
    #: taste-concentrated — leave-one-out recall@k is ceilinged at roughly
    #: k / |liked catalog items per user|, so retrieval-quality demos
    #: (tools/recall_synth.py) need a sparse liked set to be measurable.
    base_rating: float = 3.0
    seed: int = 7


def synthetic_ratings(spec: SyntheticSpec = SyntheticSpec()) -> Ratings:
    """Events drawn from a planted biased low-rank preference model:
    rating ~ clipped affine of (user bias + movie bias + latent dot)."""
    rng = np.random.default_rng(spec.seed)
    uf = rng.normal(size=(spec.n_users, spec.latent_dim)).astype(np.float32)
    vf = rng.normal(size=(spec.n_movies, spec.latent_dim)).astype(np.float32)
    ub = (spec.user_bias_scale * rng.normal(size=spec.n_users)).astype(np.float32)
    mb = (spec.movie_bias_scale * rng.normal(size=spec.n_movies)).astype(np.float32)
    u = rng.integers(1, spec.n_users + 1, spec.n_events).astype(np.int32)
    m = rng.integers(1, spec.n_movies + 1, spec.n_events).astype(np.int32)
    affinity = np.einsum("nd,nd->n", uf[u - 1], vf[m - 1]) / np.sqrt(spec.latent_dim)
    score = spec.base_rating + ub[u - 1] + mb[m - 1] + affinity
    r = np.clip(np.round((score + 0.3 * rng.normal(size=spec.n_events)) * 2) / 2, 0.5, 5.0)
    t = rng.integers(1_000_000_000, 1_600_000_000, spec.n_events).astype(np.int64)
    return Ratings(u, m, r.astype(np.float32), t)


def synthetic_ctr_dataset(
    n: int,
    user_vocab: int = 30001,
    movie_vocab: int = 1001,
    seed: int = 0,
) -> EncodedDataset:
    """CTR samples in the 27-column feature layout with a planted signal —
    benchmark fuel with controllable vocab sizes for sharding stress."""
    rng = np.random.default_rng(seed)
    feats: Dict[str, np.ndarray] = {
        "movieId": rng.integers(1, movie_vocab, n).astype(np.int32),
        "userId": rng.integers(1, user_vocab, n).astype(np.int32),
    }
    for c in ("userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
              "userRatedMovie4", "userRatedMovie5"):
        feats[c] = rng.integers(0, movie_vocab, n).astype(np.int32)
    for c in ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
              "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3"):
        feats[c] = rng.integers(-1, 19, n).astype(np.int32)
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = rng.normal(size=n).astype(np.float32)
    logit = (
        1.5 * feats["userAvgRating"]
        - 0.8 * feats["movieRatingStddev"]
        + 0.3 * (feats["movieId"] % 2)
    )
    labels = (logit + 0.5 * rng.normal(size=n) > 0).astype(np.float32)
    return EncodedDataset(feats, labels)
