"""Retrieval quality: recall@K for the two-tower model and item2vec.

BASELINE.json target: "retrieval recall@10 parity vs reference
(NeuralCF / two-tower)". The reference never measures recall; this tool
establishes it (the same protocol as PARITY.md):

- two-tower: train `neuralcf_two_tower` on trainingSamples, encode all
  1001 movie ids with the item tower ONCE, then for every positive test
  example rank the user's scores over the full catalog on device
  (`ops.topk`) and check whether the rated movie lands in the top K.
- item2vec: user embedding (mean of watched vectors) vs item embeddings,
  same protocol — the serving plane's "emb" model quality.

    python tools/recall_eval.py [--k 10] [--epochs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def two_tower_recall(train_ds, test_ds, k: int, epochs: int, seed: int = 0) -> float:
    import jax
    import jax.numpy as jnp

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    model = build_model("neuralcf_two_tower")
    trainer = Trainer(model, TrainConfig(batch_size=2048, epochs=epochs, seed=seed))
    res = trainer.fit(train_ds, verbose=False)
    params = res.params

    pos = test_ds.labels > 0.5
    users = test_ds.features["userId"][pos]
    movies = test_ds.features["movieId"][pos]
    uniq_users = np.unique(users)
    # Rank by the FULL model output (the tower dot feeds a Dense(1) whose
    # weight sign would otherwise silently invert a raw-dot ranking).
    all_movies = jnp.arange(1001, dtype=jnp.int32)

    @jax.jit
    def score_user(params, uid):
        feats = {
            "movieId": all_movies,
            "userId": jnp.full((1001,), uid, jnp.int32),
        }
        return model.apply({"params": params}, feats)

    scores = np.stack(
        [np.asarray(score_user(params, int(u))) for u in uniq_users]
    )  # [U, 1001]
    topk = np.argpartition(-scores, k, axis=1)[:, :k]
    row_of = {int(u): i for i, u in enumerate(uniq_users)}
    hits = sum(
        1 for u, m in zip(users, movies) if int(m) in set(topk[row_of[int(u)]])
    )
    return hits / max(len(users), 1)


def retrieval_two_tower_recall(
    train_ds, test_ds, k: int, epochs: int, seed: int = 0
) -> float:
    """Two-tower trained the retrieval way: in-batch sampled softmax over
    positive (user, movie) pairs — the standard upgrade over CTR-style
    training that the reference lacks (its NeuralCF is pointwise-CTR only,
    which ranks unseen movies arbitrarily; this mode makes the towers a
    real retrieval model)."""
    import jax.numpy as jnp

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.retrieval import (
        RetrievalConfig,
        RetrievalTrainer,
    )

    model = build_model("neuralcf_two_tower", hidden=(32, 32))
    trainer = RetrievalTrainer(
        model, RetrievalConfig(batch_size=1024, epochs=epochs * 4, seed=seed)
    )
    params = trainer.fit(train_ds)
    item_vecs = trainer.item_matrix(params, 1001)
    tpos = test_ds.labels > 0.5
    tusers = test_ds.features["userId"][tpos]
    tmovies = test_ds.features["movieId"][tpos]
    uniq = np.unique(tusers)
    uvecs = trainer.user_vectors(params, uniq)
    scores = np.asarray(jnp.dot(uvecs, item_vecs.T))
    topk = np.argpartition(-scores, k, axis=1)[:, :k]
    row_of = {int(u): i for i, u in enumerate(uniq)}
    hits = sum(1 for u, m in zip(tusers, tmovies) if int(m) in set(topk[row_of[int(u)]]))
    return hits / max(len(tusers), 1)


def item2vec_recall(ratings, test_ds, k: int) -> float:
    from sparrowrecsys_tpu.embedding.item2vec import Item2VecConfig, train_item2vec
    from sparrowrecsys_tpu.embedding.user_emb import generate_user_emb
    from sparrowrecsys_tpu.ops.topk import cosine_topk

    vocab, emb = train_item2vec(ratings, Item2VecConfig(epochs=5))
    uids, uemb = generate_user_emb(ratings, vocab, emb)
    urow = {int(u): i for i, u in enumerate(uids)}
    vrow = {int(v): i for i, v in enumerate(vocab)}

    pos = test_ds.labels > 0.5
    users = test_ds.features["userId"][pos]
    movies = test_ds.features["movieId"][pos]
    keep = [
        (urow[int(u)], vrow[int(m)])
        for u, m in zip(users, movies)
        if int(u) in urow and int(m) in vrow
    ]
    if not keep:
        return float("nan")
    q = uemb[[r for r, _ in keep]]
    _, idx = cosine_topk(q, emb, k)
    idx = np.asarray(idx)
    hits = sum(1 for i, (_, target) in enumerate(keep) if target in set(idx[i]))
    return hits / len(keep)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.dataset import encode_samples, load_samples_csv
    from sparrowrecsys_tpu.data.movielens import load_ratings

    data = DataConfig()
    train_ds = encode_samples(load_samples_csv(data.path("trainingSamples.csv")))
    test_ds = encode_samples(load_samples_csv(data.path("testSamples.csv")))
    ratings = load_ratings(data.path(data.ratings_csv))

    tt = two_tower_recall(train_ds, test_ds, args.k, args.epochs)
    print(f"two_tower(ctr) recall@{args.k} = {tt:.4f}")
    rt = retrieval_two_tower_recall(train_ds, test_ds, args.k, args.epochs)
    print(f"two_tower(retrieval) recall@{args.k} = {rt:.4f}")
    i2v = item2vec_recall(ratings, test_ds, args.k)
    print(f"item2vec recall@{args.k} = {i2v:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {"k": args.k, "two_tower_ctr": tt, "two_tower_retrieval": rt,
                 "item2vec": i2v}, f,
            )


if __name__ == "__main__":
    main()
