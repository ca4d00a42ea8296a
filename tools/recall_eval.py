"""Retrieval quality: recall@K under a shared leave-one-out protocol.

BASELINE.json target: "retrieval recall@10 parity vs reference
(NeuralCF / two-tower)". The reference never measures recall; this tool
establishes it.

Round-1's protocol was biased (VERDICT r1 weak-#1): item2vec trained on
ALL ratings (including the test events) and its user embeddings averaged
the very vectors it was asked to predict, while the two-tower was scored
on every test positive over the full catalog — leakage for one method,
none for the other. Round-2 protocol, identical for every method:

- Split: per user, positives = rating >= 3.5 ordered by timestamp; the
  LAST positive is the held-out test item (standard leave-one-out);
  every earlier event is training data. Users with < 2 positives are
  train-only.
- Score: rank the user over the full 1001-id catalog, EXCLUDING the
  user's seen training items (you don't re-recommend watched movies),
  hit iff the held-out item lands in the top K.
- Baselines: `popularity` (global top-K by training rating count) gives
  the floor any learned retriever must beat.

    python tools/recall_eval.py [--k 10] [--epochs 40] [--json-out recall.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ITEMS = 1001
POS_THRESHOLD = 3.5


def leave_one_out_split(ratings):
    """Returns (train_ratings, test_pairs [(u, m)], seen {u: np.ndarray}).

    Test = each eligible user's temporally-last positive event; train =
    all remaining events (positives AND negatives — negatives carry
    signal for CTR-style methods and hurt nobody else)."""
    from sparrowrecsys_tpu.data.movielens import Ratings

    u, m = ratings.user_ids, ratings.movie_ids
    r, t = ratings.ratings, ratings.timestamps
    pos = r >= POS_THRESHOLD
    # order events per user by timestamp (stable for ties)
    order = np.lexsort((t, u))
    test_mask = np.zeros(len(u), bool)
    # walk per-user runs, pick last positive of users with >= 2 positives
    su = u[order]
    starts = np.flatnonzero(np.concatenate([[True], su[1:] != su[:-1]]))
    ends = np.concatenate([starts[1:], [len(su)]])
    for s, e in zip(starts, ends):
        idx = order[s:e]
        p = idx[pos[idx]]
        if len(p) >= 2:
            test_mask[p[-1]] = True
    train = Ratings(u[~test_mask], m[~test_mask], r[~test_mask], t[~test_mask])
    test_pairs = list(zip(u[test_mask].tolist(), m[test_mask].tolist()))
    seen: dict = {}
    for uu, mm in zip(u[~test_mask], m[~test_mask]):
        seen.setdefault(int(uu), []).append(int(mm))
    seen = {k: np.unique(v) for k, v in seen.items()}
    return train, test_pairs, seen


def recall_at_k(score_rows, test_pairs, seen, k: int) -> float:
    """score_rows: {user_id: [N_ITEMS] scores}. Seen train items are
    masked out before the top-k.

    A test user the method produced NO score row for (e.g. item2vec with
    no usable history) counts as a MISS, not a skip — every method is
    scored over the identical test population, or the cross-method
    comparison in recall.json breaks (the round-1 protocol bug)."""
    hits = total = 0
    for uu, mm in test_pairs:
        total += 1
        s = score_rows.get(int(uu))
        if s is None:
            continue  # unscorable user: miss
        s = s.copy()
        sn = seen.get(int(uu))
        if sn is not None:
            # ids outside the catalog range (full MovieLens vs the vendored
            # 1001-id cut) can't be recommended anyway — don't index with them
            s[sn[sn < len(s)]] = -np.inf
        top = np.argpartition(-s, k)[:k]
        hits += int(mm in set(top.tolist()))
    return hits / max(total, 1)


def eval_two_tower_retrieval(train, test_pairs, seen, k, epochs, seed=0,
                             logq=True, serve_pop_alpha=1.0,
                             n_items=N_ITEMS, user_buckets=None) -> float:
    """logQ-corrected in-batch-softmax towers. The training correction
    subtracts log p(item), so the learned dot estimates popularity-free
    preference; serving adds alpha*log p(item) back (the principled
    inverse — rank by p(item|user) rather than the popularity-stripped
    ratio). Measured sweep (tools history, 2026-08-17): without the
    restore the model scores 0.03-0.08; with it ~0.09 — personalization
    headroom over popularity on this 22k-event sample is ~nil because a
    median user has <2 train positives (only 1238 events carry any
    history)."""
    import jax.numpy as jnp

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.retrieval import (
        RetrievalConfig,
        RetrievalTrainer,
    )

    pos = train.ratings >= POS_THRESHOLD
    users = train.user_ids[pos]
    movies = train.movie_ids[pos]
    extra = {}
    if n_items != N_ITEMS:
        extra["movie_buckets"] = n_items
    if user_buckets is not None:
        extra["user_buckets"] = user_buckets
    model = build_model("neuralcf_two_tower", hidden=(32, 32), **extra)
    trainer = RetrievalTrainer(
        model, RetrievalConfig(batch_size=1024, epochs=epochs, seed=seed,
                               logq=logq)
    )
    params = trainer.fit_pairs(users, movies)
    item_vecs = trainer.item_matrix(params, n_items)
    uniq = np.unique([u for u, _ in test_pairs])
    uvecs = trainer.user_vectors(params, uniq)
    scores = np.asarray(jnp.dot(uvecs, item_vecs.T))
    if serve_pop_alpha:
        counts = np.bincount(movies, minlength=n_items)[:n_items]
        scores = scores + serve_pop_alpha * np.log(np.maximum(counts, 0.5))
    return recall_at_k(
        {int(u): scores[i] for i, u in enumerate(uniq)}, test_pairs, seen, k
    )


def eval_item2vec(train, test_pairs, seen, k, n_items=N_ITEMS) -> float:
    from sparrowrecsys_tpu.embedding.item2vec import (
        Item2VecConfig,
        train_item2vec,
    )
    from sparrowrecsys_tpu.embedding.user_emb import generate_user_emb

    # parity config (dim 10, window 5, 10 epochs — Embedding.scala:130-133).
    # Swept 2026-08-17: e5 0.022 / e10 0.040 / e30 0.023 (overfits), dim-32
    # and extra negatives don't help; item-kNN scoring with a popularity
    # blend reaches 0.077 — every variant stays under the 0.090 popularity
    # floor on this sample.
    vocab, emb = train_item2vec(train, Item2VecConfig())
    uids, uemb = generate_user_emb(train, vocab, emb)
    urow = {int(x): i for i, x in enumerate(uids)}
    # scatter item vectors into catalog-id space; items without an
    # embedding score -inf (can't be retrieved)
    full = np.full((n_items, emb.shape[1]), 0.0, np.float32)
    have = np.zeros(n_items, bool)
    for i, v in enumerate(vocab):
        if 0 <= int(v) < n_items:
            full[int(v)] = emb[i]
            have[int(v)] = True
    fn = full / np.maximum(np.linalg.norm(full, axis=1, keepdims=True), 1e-9)
    rows = {}
    for uu in {u for u, _ in test_pairs}:
        i = urow.get(int(uu))
        if i is None:
            continue
        q = uemb[i]
        q = q / max(np.linalg.norm(q), 1e-9)
        s = fn @ q
        s[~have] = -np.inf
        rows[int(uu)] = s
    return recall_at_k(rows, test_pairs, seen, k)


def eval_two_tower_ctr(train, test_pairs, seen, k, epochs, seed=0) -> float:
    """Strawman: CTR-pointwise-trained towers (the reference's NeuralCF
    recipe, `NeuralCF.py:83-93`) evaluated as a retriever. Trains on a
    binary-label view of the train events (label = rating >= 3.5)."""
    import jax
    import jax.numpy as jnp

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.dataset import EncodedDataset
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    feats = {
        "movieId": train.movie_ids.astype(np.int32),
        "userId": train.user_ids.astype(np.int32),
    }
    labels = (train.ratings >= POS_THRESHOLD).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    model = build_model("neuralcf_two_tower")
    trainer = Trainer(model, TrainConfig(batch_size=2048, epochs=epochs, seed=seed))
    res = trainer.fit(ds, verbose=False)
    params = res.params
    all_movies = jnp.arange(N_ITEMS, dtype=jnp.int32)

    @jax.jit
    def score_user(params, uid):
        f = {"movieId": all_movies, "userId": jnp.full((N_ITEMS,), uid, jnp.int32)}
        return model.apply({"params": params}, f)

    rows = {}
    for uu in {u for u, _ in test_pairs}:
        rows[int(uu)] = np.asarray(score_user(params, int(uu)))
    return recall_at_k(rows, test_pairs, seen, k)


def _item2vec_item_vectors(train):
    """Normalized catalog-space item2vec vectors + have-mask (parity
    config, Embedding.scala:130-133)."""
    from sparrowrecsys_tpu.embedding.item2vec import (
        Item2VecConfig,
        train_item2vec,
    )

    vocab, emb = train_item2vec(train, Item2VecConfig())
    full = np.zeros((N_ITEMS, emb.shape[1]), np.float32)
    have = np.zeros(N_ITEMS, bool)
    for i, v in enumerate(vocab):
        if 0 <= int(v) < N_ITEMS:
            full[int(v)] = emb[i]
            have[int(v)] = True
    fn = full / np.maximum(np.linalg.norm(full, axis=1, keepdims=True), 1e-9)
    return fn, have


def _knn_personal_rows(train, users, fn, have):
    """Per-user item-kNN signal: cosine of each catalog item to the mean
    of the user's train-positive item vectors; 0 (neutral) where either
    side has no embedding — the blend falls back to popularity there."""
    pos = train.ratings >= POS_THRESHOLD
    hist: dict = {}
    for uu, mm in zip(train.user_ids[pos], train.movie_ids[pos]):
        if 0 <= int(mm) < N_ITEMS and have[int(mm)]:
            hist.setdefault(int(uu), []).append(int(mm))
    rows = {}
    for uu in users:
        h = hist.get(int(uu))
        if not h:
            rows[int(uu)] = np.zeros(N_ITEMS, np.float32)
            continue
        q = fn[h].mean(axis=0)
        q = q / max(np.linalg.norm(q), 1e-9)
        s = fn @ q
        s[~have] = 0.0
        rows[int(uu)] = s.astype(np.float32)
    return rows


def _zscore(x, mask=None):
    m = np.ones_like(x, bool) if mask is None else mask
    if not m.any():
        return np.zeros_like(x)
    mu, sd = x[m].mean(), x[m].std()
    return (x - mu) / max(sd, 1e-9)


def eval_tuned_blend(train, test_pairs, seen, k):
    """Popularity + beta * item-kNN(item2vec), beta tuned on a proper
    validation split (per-user last TRAIN positive of users with >= 2
    train positives; the kNN model for tuning is trained WITHOUT the
    validation items). The chosen beta is then applied to a kNN model
    trained on the full train set and scored on the untouched test split.
    With beta=0 the blend IS the popularity ranker, so the tuned blend
    can only lose to the floor through validation/test disagreement —
    this is the honest 'beat popularity if the data allows it' retriever.

    Returns (test_recall, beta)."""
    # validation = the same per-user last-train-positive protocol as the
    # test split, applied to the train subset (ONE split implementation:
    # a protocol change there changes both splits together).
    train2, val_pairs, seen2 = leave_one_out_split(train)

    betas = (0.0, 0.1, 0.25, 0.5, 1.0, 2.0, 4.0)

    def blend_recall(tr, pairs, sn, beta_list):
        counts = np.bincount(
            tr.movie_ids[tr.ratings >= POS_THRESHOLD], minlength=N_ITEMS
        )[:N_ITEMS]
        pop = _zscore(np.log(np.maximum(counts, 0.5)).astype(np.float32))
        fn, have = _item2vec_item_vectors(tr)
        users = sorted({uu for uu, _ in pairs})
        personal = _knn_personal_rows(tr, users, fn, have)
        out = {}
        for beta in beta_list:
            # z-score over embedded items only; items item2vec never saw
            # stay exactly popularity-ranked (neutral 0), not penalized
            rows = {
                uu: pop + beta * np.where(
                    have, _zscore(personal[uu], have), 0.0
                )
                for uu in users
            }
            out[beta] = recall_at_k(rows, pairs, sn, k)
        return out

    val = blend_recall(train2, val_pairs, seen2, betas)
    beta = max(betas, key=lambda b: val[b])
    print("  blend validation sweep:",
          {f"{b:g}": round(v, 4) for b, v in val.items()})
    test = blend_recall(train, test_pairs, seen, (beta,))
    return test[beta], beta


def eval_popularity(train, test_pairs, seen, k, n_items=N_ITEMS) -> float:
    counts = np.bincount(train.movie_ids, minlength=n_items)[:n_items]
    s = counts.astype(np.float32)
    rows = {int(u): s for u, _ in test_pairs}
    return recall_at_k(rows, test_pairs, seen, k)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--ctr-epochs", type=int, default=5)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.movielens import load_ratings

    data = DataConfig()
    ratings = load_ratings(data.path(data.ratings_csv))
    train, test_pairs, seen = leave_one_out_split(ratings)
    print(
        f"leave-one-out: {len(test_pairs)} test users, "
        f"{len(train)} train events"
    )

    pop = eval_popularity(train, test_pairs, seen, args.k)
    print(f"popularity           recall@{args.k} = {pop:.4f}")
    i2v = eval_item2vec(train, test_pairs, seen, args.k)
    print(f"item2vec             recall@{args.k} = {i2v:.4f}")
    rt = eval_two_tower_retrieval(train, test_pairs, seen, args.k, args.epochs)
    print(f"two_tower(retrieval) recall@{args.k} = {rt:.4f}")
    ctr = eval_two_tower_ctr(train, test_pairs, seen, args.k, args.ctr_epochs)
    print(f"two_tower(ctr)       recall@{args.k} = {ctr:.4f}")
    blend, beta = eval_tuned_blend(train, test_pairs, seen, args.k)
    print(f"tuned_blend(b={beta:g})  recall@{args.k} = {blend:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            import jax

            json.dump(
                {
                    "k": args.k,
                    "protocol": "leave-one-out, seen-items excluded",
                    "backend": jax.devices()[0].platform,
                    "popularity": pop,
                    "item2vec": i2v,
                    "two_tower_retrieval": rt,
                    "two_tower_ctr": ctr,
                    "tuned_blend": blend,
                    "tuned_blend_beta": beta,
                    "note": (
                        "round-1 numbers (item2vec 0.266 / two-tower 0.022) "
                        "used a leaky asymmetric protocol; see BASELINE.md"
                    ),
                },
                f,
            )


if __name__ == "__main__":
    main()
