"""Retrieval experiment: can anything beat global popularity honestly?

The leave-one-out test item is each user's temporally LAST positive
(tools/recall_eval.py), so two classical signals should help where the
22k-event sample's per-user sparsity (median < 2 train positives) makes
embedding methods hopeless:

- recency-weighted popularity: the catalog drifts over time; an
  exponentially-decayed count ranks currently-hot items above all-time
  hits (tuned half-life);
- co-occurrence item-CF: shrunk cosine over the binary user x item
  positive matrix (the only stable item-item signal at this scale;
  reference analogue: none — Embedding.scala's item2vec is the
  reference's sole retriever signal).

Protocol discipline: every knob (half-life tau, shrinkage lam, blend
beta) is tuned on a validation split carved from TRAIN (per-user last
train positive); the untouched test split is scored ONCE with the chosen
config at the end. All numpy, no device needed.

    python tools/retrieval_exp.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.recall_eval import (
    N_ITEMS,
    POS_THRESHOLD,
    leave_one_out_split,
    recall_at_k,
)

K = 10


def split_validation(train):
    """Per-user last train positive (users with >= 2 train positives)."""
    from sparrowrecsys_tpu.data.movielens import Ratings

    u, m, r, t = train.user_ids, train.movie_ids, train.ratings, train.timestamps
    pos = r >= POS_THRESHOLD
    order = np.lexsort((t, u))
    su = u[order]
    starts = np.flatnonzero(np.concatenate([[True], su[1:] != su[:-1]]))
    ends = np.concatenate([starts[1:], [len(su)]])
    val_mask = np.zeros(len(u), bool)
    for s, e in zip(starts, ends):
        idx = order[s:e]
        p = idx[pos[idx]]
        if len(p) >= 2:
            val_mask[p[-1]] = True
    train2 = Ratings(u[~val_mask], m[~val_mask], r[~val_mask], t[~val_mask])
    val_pairs = list(zip(u[val_mask].tolist(), m[val_mask].tolist()))
    seen2: dict = {}
    for uu, mm in zip(u[~val_mask], m[~val_mask]):
        seen2.setdefault(int(uu), []).append(int(mm))
    seen2 = {kk: np.unique(v) for kk, v in seen2.items()}
    return train2, val_pairs, seen2


def decayed_pop(tr, tau):
    """Exponentially-decayed positive counts (tau in seconds; None = flat)."""
    pos = tr.ratings >= POS_THRESHOLD
    m, t = tr.movie_ids[pos], tr.timestamps[pos].astype(np.float64)
    if tau is None:
        return np.bincount(m, minlength=N_ITEMS)[:N_ITEMS].astype(np.float32)
    w = np.exp(-(t.max() - t) / tau)
    s = np.zeros(N_ITEMS, np.float64)
    np.add.at(s, m, w)
    return s.astype(np.float32)


def cooc_sim(tr, lam):
    """Shrunk cosine over the binary user x item positive matrix:
    sim[i,j] = c[i,j] / (sqrt(c[i,i] * c[j,j]) + lam)."""
    pos = tr.ratings >= POS_THRESHOLD
    u, m = tr.user_ids[pos], tr.movie_ids[pos]
    keep = (m >= 0) & (m < N_ITEMS)
    u, m = u[keep], m[keep]
    uniq_u = {x: i for i, x in enumerate(np.unique(u))}
    rows = np.array([uniq_u[x] for x in u])
    A = np.zeros((len(uniq_u), N_ITEMS), np.float32)
    A[rows, m] = 1.0
    c = A.T @ A
    d = np.sqrt(np.diag(c))
    sim = c / (d[:, None] * d[None, :] + lam)
    np.fill_diagonal(sim, 0.0)
    return sim


def user_histories(tr):
    pos = tr.ratings >= POS_THRESHOLD
    hist: dict = {}
    for uu, mm, tt in zip(tr.user_ids[pos], tr.movie_ids[pos],
                          tr.timestamps[pos]):
        if 0 <= int(mm) < N_ITEMS:
            hist.setdefault(int(uu), []).append((int(tt), int(mm)))
    return {u: [m for _, m in sorted(h)] for u, h in hist.items()}


def zs(x):
    return (x - x.mean()) / max(x.std(), 1e-9)


def score_config(tr, pairs, sn, tau, lam, beta, sim=None, pop=None):
    if pop is None:
        pop = decayed_pop(tr, tau)
    popz = zs(np.log(np.maximum(pop, 1e-3)))
    if beta and sim is None:
        sim = cooc_sim(tr, lam)
    hist = user_histories(tr) if beta else {}
    rows = {}
    for uu in {p[0] for p in pairs}:
        s = popz.copy()
        if beta:
            h = hist.get(int(uu))
            if h:
                cf = sim[h].sum(axis=0)
                if cf.std() > 1e-9:
                    s = popz + beta * zs(cf)
        rows[int(uu)] = s
    return recall_at_k(rows, pairs, sn, K)


def main():
    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.movielens import load_ratings

    data = DataConfig()
    ratings = load_ratings(data.path(data.ratings_csv))
    train, test_pairs, seen = leave_one_out_split(ratings)
    train2, val_pairs, seen2 = split_validation(train)
    print(f"val users: {len(val_pairs)}  test users: {len(test_pairs)}")

    day = 86400.0
    # --- stage 1: recency-weighted popularity (tau sweep) ---------------
    taus = [None, 30 * day, 90 * day, 180 * day, 365 * day, 730 * day,
            1460 * day]
    pop_val = {}
    for tau in taus:
        v = score_config(train2, val_pairs, seen2, tau, 0, 0.0)
        pop_val[tau] = v
        label = "flat" if tau is None else f"{tau/day:.0f}d"
        print(f"  pop tau={label:>6}: val recall@{K} = {v:.4f}")
    best_tau = max(pop_val, key=lambda x: pop_val[x])

    # --- stage 2: co-occurrence CF blend on top of best pop -------------
    best = (best_tau, 0, 0.0, pop_val[best_tau])
    for lam in (1.0, 5.0, 20.0):
        sim = cooc_sim(train2, lam)
        for beta in (0.25, 0.5, 1.0, 2.0):
            v = score_config(train2, val_pairs, seen2, best_tau, lam, beta,
                             sim=sim)
            print(f"  cf lam={lam:<4} beta={beta:<4}: val = {v:.4f}")
            if v > best[3]:
                best = (best_tau, lam, beta, v)

    tau, lam, beta, vbest = best
    label = "flat" if tau is None else f"{tau/day:.0f}d"
    print(f"chosen: tau={label} lam={lam} beta={beta} (val {vbest:.4f})")

    # --- final: ONE test evaluation with the chosen config --------------
    flat_test = score_config(train, test_pairs, seen, None, 0, 0.0)
    tuned_test = score_config(train, test_pairs, seen, tau, lam, beta)
    print(f"TEST flat popularity  recall@{K} = {flat_test:.4f}")
    print(f"TEST tuned retriever  recall@{K} = {tuned_test:.4f}")


if __name__ == "__main__":
    main()
