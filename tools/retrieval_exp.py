"""Experiment: can ANY classical retriever beat the popularity floor on
the vendored sample under the honest leave-one-out protocol?

Angles not yet swept (recall_eval.py covers item2vec/two-tower/blend):
- item-item covisitation (normalized co-occurrence counts over user
  histories), the workhorse production candidate generator;
- ALS latent factors (models/als.py) scored as user @ item.T;
- covisitation + popularity backoff for empty-history users.

Run on CPU: python tools/retrieval_exp.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tools.recall_eval import (
    N_ITEMS,
    POS_THRESHOLD,
    leave_one_out_split,
    recall_at_k,
)


def covisit_scores(train, test_users, alpha=0.5, pos_only=True, backoff=True):
    """score(u, i) = sum_{j in hist(u)} C[j,i] / (n_j^alpha * n_i^alpha);
    C from co-occurrence within a user's train events."""
    r = train.ratings
    keep = r >= POS_THRESHOLD if pos_only else np.ones(len(r), bool)
    u = train.user_ids[keep]
    m = train.movie_ids[keep]
    ok = (m >= 0) & (m < N_ITEMS)
    u, m = u[ok], m[ok]
    # co-occurrence via per-user item lists
    hist: dict = {}
    for uu, mm in zip(u, m):
        hist.setdefault(int(uu), set()).add(int(mm))
    C = np.zeros((N_ITEMS, N_ITEMS), np.float32)
    for items in hist.values():
        idx = np.fromiter(items, np.int64)
        C[np.ix_(idx, idx)] += 1.0
    np.fill_diagonal(C, 0.0)
    n = np.maximum(C.sum(axis=1) > 0, 1e-9)  # placeholder, replaced below
    counts = np.bincount(m, minlength=N_ITEMS)[:N_ITEMS].astype(np.float32)
    denom = np.maximum(counts, 1.0) ** alpha
    Cn = C / denom[:, None] / denom[None, :]
    pop = np.log(np.maximum(counts, 0.5))
    pop = (pop - pop.mean()) / max(pop.std(), 1e-9)
    rows = {}
    for uu in test_users:
        h = hist.get(int(uu))
        if h:
            idx = np.fromiter(h, np.int64)
            s = Cn[idx].sum(axis=0)
            if s.max() <= 0 and backoff:
                s = pop.copy()
        else:
            s = pop.copy() if backoff else np.zeros(N_ITEMS, np.float32)
        rows[int(uu)] = s.astype(np.float32)
    return rows


def covisit_plus_pop(train, test_users, alpha=0.5, beta=1.0):
    """z-scored covisitation + popularity (additive, like tuned_blend)."""
    rows = covisit_scores(train, test_users, alpha=alpha, backoff=False)
    counts = np.bincount(
        train.movie_ids[train.ratings >= POS_THRESHOLD], minlength=N_ITEMS
    )[:N_ITEMS].astype(np.float32)
    pop = np.log(np.maximum(counts, 0.5))
    pop = (pop - pop.mean()) / max(pop.std(), 1e-9)
    out = {}
    for uu, s in rows.items():
        if s.std() > 0:
            sz = (s - s.mean()) / s.std()
        else:
            sz = s
        out[uu] = pop + beta * sz
    return out


def als_scores(train, test_users, rank=10, reg=0.01, iters=5):
    from sparrowrecsys_tpu.models.als import ALSConfig, train_als

    cfg = ALSConfig(rank=rank, reg_param=reg, max_iter=iters)
    model = train_als(train, cfg)
    uf = np.asarray(model.user_factors)
    itf = np.asarray(model.item_factors)
    umap = {int(x): i for i, x in enumerate(np.asarray(model.user_ids))}
    imap = np.asarray(model.item_ids)
    full = np.zeros((N_ITEMS, itf.shape[1]), np.float32)
    have = np.zeros(N_ITEMS, bool)
    for i, v in enumerate(imap):
        if 0 <= int(v) < N_ITEMS:
            full[int(v)] = itf[i]
            have[int(v)] = True
    rows = {}
    for uu in test_users:
        i = umap.get(int(uu))
        if i is None:
            continue
        s = full @ uf[i]
        s[~have] = -np.inf
        rows[int(uu)] = s.astype(np.float32)
    return rows


def main():
    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.movielens import load_ratings

    data = DataConfig()
    ratings = load_ratings(data.path(data.ratings_csv))
    train, test_pairs, seen = leave_one_out_split(ratings)
    test_users = sorted({u for u, _ in test_pairs})
    k = 10
    print(f"{len(test_pairs)} test users")

    for alpha in (0.0, 0.3, 0.5, 0.7, 1.0):
        rows = covisit_scores(train, test_users, alpha=alpha)
        print(f"covisit alpha={alpha:<4} recall@10 = "
              f"{recall_at_k(rows, test_pairs, seen, k):.4f}")
    for beta in (0.25, 0.5, 1.0, 2.0):
        rows = covisit_plus_pop(train, test_users, alpha=0.5, beta=beta)
        print(f"covisit+pop b={beta:<4} recall@10 = "
              f"{recall_at_k(rows, test_pairs, seen, k):.4f}")
    try:
        rows = als_scores(train, test_users)
        print(f"als rank=10          recall@10 = "
              f"{recall_at_k(rows, test_pairs, seen, k):.4f}")
    except Exception as e:
        print("als failed:", e)


if __name__ == "__main__":
    main()
