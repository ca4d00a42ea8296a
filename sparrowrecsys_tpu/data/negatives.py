"""DIEN negative-sample columns.

Rebuild of `TFRecModel/.../DIEN.py:31-49` (`get_dataset_with_negtive_movie`):
for each of userRatedMovie2..5, draw a uniformly random movieId in
[0, 1001) different from that history id. The reference does this in
pandas with `random.sample` per cell (O(N) Python); here it is one
vectorized draw with rejection-resampling for collisions, seeded
(reference seeds 2020/2021 for train/test at DIEN.py:52-53).

Preserved quirk (documented, SURVEY.md §7): negatives can collide with the
user's *other* watched movies or the true positive — the reference only
excludes the id in the same column.
"""

from __future__ import annotations

import numpy as np

from sparrowrecsys_tpu.config import MOVIE_VOCAB_SIZE
from sparrowrecsys_tpu.data.dataset import EncodedDataset

NEG_COLS = (
    "negativeUserRatedMovie2", "negativeUserRatedMovie3",
    "negativeUserRatedMovie4", "negativeUserRatedMovie5",
)


def add_dien_negatives(
    ds: EncodedDataset,
    seed: int,
    vocab: int = MOVIE_VOCAB_SIZE,
    recent_movies: int = 5,
) -> EncodedDataset:
    rng = np.random.default_rng(seed)
    n = len(ds)
    feats = dict(ds.features)
    src_cols = tuple(f"userRatedMovie{k}" for k in range(2, recent_movies + 1))
    neg_cols = tuple(
        f"negativeUserRatedMovie{k}" for k in range(2, recent_movies + 1)
    )
    for src, dst in zip(src_cols, neg_cols):
        pos = feats[src]
        neg = rng.integers(0, vocab, size=n)
        clash = neg == pos
        while clash.any():
            neg[clash] = rng.integers(0, vocab, size=int(clash.sum()))
            clash = neg == pos
        feats[dst] = neg.astype(np.int32)
    return EncodedDataset(feats, ds.labels)
