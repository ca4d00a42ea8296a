"""User embeddings: mean of watched movies' item vectors.

Rebuild of `generateUserEmb` (`offline/spark/embedding/Embedding.scala:
75-126`): for every rating event (no rating filter), accumulate the movie's
item2vec vector per user and average. The Scala reference averages
(91-100); the PySpark mirror sums (Embedding.py:275-276) — a real mirror
divergence (SURVEY.md §7); we take the mean and expose `mode="sum"` for the
PySpark behaviour.

Implemented as a segment-sum over the ratings table — one vectorized pass
instead of the reference's driver-side collect() loop.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from sparrowrecsys_tpu.data.movielens import Ratings


def generate_user_emb(
    ratings: Ratings,
    item_vocab: np.ndarray,
    item_emb: np.ndarray,
    mode: str = "mean",
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (user_ids [U], embeddings [U, D]).

    Events whose movie has no item embedding are skipped (parity:
    Embedding.scala:93 `if(movieEmb.isDefined)`).
    """
    assert mode in ("mean", "sum")
    max_item = int(item_vocab.max()) if len(item_vocab) else 0
    lut = np.full(max_item + 1, -1, np.int64)
    lut[item_vocab.astype(np.int64)] = np.arange(len(item_vocab))
    mids = ratings.movie_ids.astype(np.int64)
    rows = np.where(mids <= max_item, lut[np.minimum(mids, max_item)], -1)
    keep = rows >= 0
    users = ratings.user_ids[keep].astype(np.int64)
    vecs = item_emb[rows[keep]]

    user_ids, inv = np.unique(users, return_inverse=True)
    d = item_emb.shape[1]
    acc = np.zeros((len(user_ids), d), np.float64)
    np.add.at(acc, inv, vecs)
    if mode == "mean":
        counts = np.bincount(inv, minlength=len(user_ids)).astype(np.float64)
        acc /= counts[:, None]
    return user_ids, acc.astype(np.float32)
