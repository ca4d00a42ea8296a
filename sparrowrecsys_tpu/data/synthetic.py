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


def synthetic_sequence_ctr_dataset(
    n: int,
    movie_vocab: int = 1001,
    user_vocab: int = 30001,
    seed: int = 0,
    t: int = 5,
    recency: float = 0.6,
    gain: float = 3.0,
    compat_dim: int = 8,
    markov_tau: float = 1.5,
) -> EncodedDataset:
    """CTR samples whose ONLY signal is *sequential*: the label depends on
    a planted low-rank item-item compatibility between the candidate and
    the recent history, with recency-decayed weights.

        logit = gain * sum_t recency^t * <A[hist_t], B[cand]> / norm

    The history itself is a Markov walk under the SAME planted kernel
    (`markov_tau` scales the transition logits `tau*<A[i],B[j]>/sqrt(d)`;
    tau=0 degenerates to iid-uniform history): each item is drawn given
    the one before it, so "what comes next" is genuinely predictable from
    the recent past — the structure DIEN's auxiliary next-click loss
    (DIEN.py:275-308) exists to exploit.

    Every other column (userId, genres, numerics) is independent noise, so:
    - models without a history->candidate interaction channel (DeepFM's FM
      cross is over id/user/genre embeddings; EmbeddingMLP sees only id
      embeddings) are capped at AUC ~0.5;
    - DIN's target attention (DIN.py:144-163 intent) can extract the
      compatibility but its sum-pooling is PERMUTATION-INVARIANT over the
      history, so the recency weighting and the walk direction are
      invisible to it;
    - DIEN's GRU/AUGRU consumes the history IN ORDER and its aux loss
      directly supervises the planted transition — the architecture's
      core claim (DIEN.py:181-262).

    The planted matrices A, B are zero-mean random Gaussian rows, so
    label|candidate carries ~no signal — candidate-id popularity
    memorization doesn't help (pinned by a test). `oracle_logits`
    (returned via the companion function below) gives the Bayes-optimal
    score for ceiling checks.
    """
    feats, labels, _ = _sequence_ctr(
        n, movie_vocab, user_vocab, seed, t, recency, gain, compat_dim,
        markov_tau,
    )
    return EncodedDataset(feats, labels)


def sequence_ctr_with_oracle(
    n: int,
    movie_vocab: int = 1001,
    user_vocab: int = 30001,
    seed: int = 0,
    t: int = 5,
    recency: float = 0.6,
    gain: float = 3.0,
    compat_dim: int = 8,
    markov_tau: float = 1.5,
):
    """(EncodedDataset, oracle_logits): same generator, plus the planted
    Bayes-optimal logit per example for AUC-ceiling measurement."""
    feats, labels, logit = _sequence_ctr(
        n, movie_vocab, user_vocab, seed, t, recency, gain, compat_dim,
        markov_tau,
    )
    return EncodedDataset(feats, labels), logit


def drift_ctr_with_oracle(
    n: int,
    movie_vocab: int = 1001,
    user_vocab: int = 30001,
    seed: int = 0,
    t: int = 5,
    drift_rho: float = 0.9,
    tau: float = 2.0,
    gain: float = 4.0,
    compat_dim: int = 8,
    chunk: int = 262_144,
):
    """Interest-DRIFT generator (VERDICT r4 #3b): the setting where DIEN's
    auxiliary loss could genuinely help, unlike `_sequence_ctr` whose
    Markov history may carry no next-step signal the terminal label
    doesn't already extract.

    Each example has a latent taste vector that EVOLVES over the sequence
    as an AR(1) random walk (taste_{k+1} = rho*taste_k + sqrt(1-rho^2)*eps,
    stationary N(0, I)); the history item at each step is a noisy
    observation of the taste AT THAT TIME (Gumbel-max over tau * E @
    taste_k); the label depends ONLY on the FINAL taste vs the candidate
    (sigmoid(gain * taste_T . B[cand] / sqrt(d))). Recovering the label
    signal requires FILTERING the taste trajectory from the observations —
    exactly the per-step supervision DIEN's next-item auxiliary head
    provides (hidden_t must track taste_t to predict item_{t+1}); the
    terminal label alone gives 1 bit/sequence. The published claim under
    test: aux loss helps interest evolution over long sequences
    (`/root/reference/TFRecModel/.../DIEN.py:275-308`).

    History layout parity: userRatedMovie1..t most-recent-first (column 0
    = newest = drawn from the taste closest to the label's). Returns
    (EncodedDataset, oracle_logits) like `sequence_ctr_with_oracle`.
    """
    rng = np.random.default_rng(seed)
    e = rng.normal(size=(movie_vocab, compat_dim)).astype(np.float32)
    b = rng.normal(size=(movie_vocab, compat_dim)).astype(np.float32)
    hist = np.empty((n, t), np.int32)
    taste = rng.normal(size=(n, compat_dim)).astype(np.float32)
    sig = np.sqrt(1.0 - drift_rho ** 2).astype(np.float32)
    # Oldest -> newest: column t-1 first (most-recent-first layout).
    for step in range(t - 1, -1, -1):
        # Gumbel-max categorical over tau * taste @ E^T, chunked so the
        # [c, V] logits never exceed ~1 GB at the default chunk.
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            logits = tau * (taste[lo:hi] @ e[1:].T)     # [c, V-1]
            g = rng.gumbel(size=logits.shape).astype(np.float32)
            hist[lo:hi, step] = 1 + np.argmax(logits + g, axis=1)
        if step > 0:
            taste = drift_rho * taste + sig * rng.normal(
                size=taste.shape
            ).astype(np.float32)
    # taste now = taste at the NEWEST step (the terminal interest).
    cand = rng.integers(1, movie_vocab, n).astype(np.int32)
    logit = gain * np.einsum("nd,nd->n", taste, b[cand]) / np.sqrt(compat_dim)
    labels = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)

    feats: Dict[str, np.ndarray] = {
        "movieId": cand,
        "userId": rng.integers(1, user_vocab, n).astype(np.int32),
    }
    for k in range(t):
        feats[f"userRatedMovie{k + 1}"] = hist[:, k]
    for c in ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
              "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3"):
        feats[c] = rng.integers(-1, 19, n).astype(np.int32)
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = rng.normal(size=n).astype(np.float32)
    return EncodedDataset(feats, labels), logit.astype(np.float32)


def _markov_history(rng, a, b, n, t, tau, compat_dim):
    """[n, t] walk, column t-1 oldest -> column 0 most recent (the
    userRatedMovie1..t layout is most-recent-first). Ids in [1, vocab).

    Sampling is per-row Walker alias tables: O(1) per draw (two table
    reads). The first implementation inverse-CDF'd each step in [c, V]
    chunks — O(V) memory traffic per draw, measured 30+ CPU-minutes for
    a 2.3M x 64 walk; alias does the same walk in seconds. NOTE: the
    switch changes the RNG stream, so a given seed's dataset differs
    from pre-2026-08-19 runs (recorded tables were regenerated).

    Memory bound: the dense (V-1)x(V-1) prob+alias tables cost ~8*V^2
    bytes — fine at the default 1001-item vocab (~8 MB) but ~5.8 GB at a
    27k-item catalog. For vocabs past ~8k, build per-row tables lazily or
    top-k-truncate the transition rows before aliasing (ADVICE r3)."""
    vocab = a.shape[0]
    logits = tau * (a[1:] @ b[1:].T) / np.sqrt(compat_dim)
    logits -= logits.max(axis=1, keepdims=True)
    p = np.exp(logits, dtype=np.float64)
    p /= p.sum(axis=1, keepdims=True)
    v = vocab - 1
    prob = np.empty((v, v), np.float32)
    alias = np.empty((v, v), np.int32)
    for i in range(v):
        prob[i], alias[i] = _walker_alias_row(p[i])
    hist = np.empty((n, t), np.int32)
    hist[:, t - 1] = rng.integers(1, vocab, n)
    for step in range(t - 2, -1, -1):
        prev = hist[:, step + 1] - 1
        idx = rng.integers(0, v, n)
        keep = rng.random(n) < prob[prev, idx]
        hist[:, step] = 1 + np.where(keep, idx, alias[prev, idx])
    return hist


def _walker_alias_row(p: np.ndarray):
    """(prob, alias) Walker tables for one categorical row (O(V) build)."""
    v = len(p)
    scaled = p / p.sum() * v
    prob = np.ones(v)
    alias = np.arange(v)
    small = [i for i in range(v) if scaled[i] < 1.0]
    large = [i for i in range(v) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] -= 1.0 - scaled[s]
        (small if scaled[l] < 1.0 else large).append(l)
    return prob, alias


def _sequence_ctr(
    n, movie_vocab, user_vocab, seed, t, recency, gain, compat_dim, markov_tau
):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(movie_vocab, compat_dim)).astype(np.float32)
    b = rng.normal(size=(movie_vocab, compat_dim)).astype(np.float32)
    if markov_tau > 0:
        hist = _markov_history(rng, a, b, n, t, markov_tau, compat_dim)
    else:
        hist = rng.integers(1, movie_vocab, (n, t)).astype(np.int32)
    cand = rng.integers(1, movie_vocab, n).astype(np.int32)
    w = (recency ** np.arange(t)).astype(np.float32)
    compat = np.einsum("ntd,nd->nt", a[hist], b[cand]) / np.sqrt(compat_dim)
    logit = gain * (compat @ w) / float(np.linalg.norm(w))
    labels = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)

    feats: Dict[str, np.ndarray] = {
        "movieId": cand,
        "userId": rng.integers(1, user_vocab, n).astype(np.int32),
    }
    for k in range(t):
        feats[f"userRatedMovie{k + 1}"] = hist[:, k]
    for c in ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
              "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3"):
        feats[c] = rng.integers(-1, 19, n).astype(np.int32)
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = rng.normal(size=n).astype(np.float32)
    return feats, labels, logit.astype(np.float32)
