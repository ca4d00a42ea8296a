"""Two-tower retrieval recall on data where personalization IS learnable.

On the bundled 22k-event MovieLens sample no method beats the popularity
floor (recall.json; the median test user has <2 train positives — a data
property, BASELINE.md). This tool runs the IDENTICAL leave-one-out
protocol (tools/recall_eval.py) on the planted-structure synthetic
dataset, where users have ~100 events each and preferences follow a
low-rank model plus user/movie biases: if the retriever machinery is
sound, the logQ-corrected two-tower must clear the popularity floor by
a wide margin here.

    python tools/recall_synth.py [--users 30000 --movies 5000
                                  --events 3000000 --epochs 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.recall_eval import (
    eval_item2vec,
    eval_popularity,
    eval_two_tower_retrieval,
    leave_one_out_split,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=30_000)
    ap.add_argument("--movies", type=int, default=1_000)
    ap.add_argument("--events", type=int, default=10_000_000)
    # base 1.0 -> ~2% of catalog clears the 3.5 positive line: each user
    # LIKES ~20 of 1000 items, so the leave-one-out ceiling (~k/|liked|)
    # is ~0.5 instead of ~0.006 at the CTR-demo default base 3.0 (where a
    # third of the catalog is liked and NO method can score recall@10 —
    # measured: popularity 0.0011, two-tower 0.0025 at base 3.0).
    ap.add_argument("--base-rating", type=float, default=1.0)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-test-users", type=int, default=10_000,
                    help="cap the eval population (scores matrix is "
                         "[test_users, movies])")
    ap.add_argument("--item2vec", action="store_true",
                    help="also score the reference's retriever recipe "
                         "(item2vec + mean user embedding) on this data")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax

    from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings

    ratings = synthetic_ratings(
        SyntheticSpec(
            args.users, args.movies, args.events,
            base_rating=args.base_rating,
        )
    )
    train, test_pairs, seen = leave_one_out_split(ratings)
    if len(test_pairs) > args.max_test_users:
        rng = np.random.default_rng(0)
        idx = rng.choice(len(test_pairs), args.max_test_users, replace=False)
        test_pairs = [test_pairs[i] for i in idx]
    print(
        f"leave-one-out: {len(test_pairs)} test users (of "
        f"{args.users}), {len(train)} train events", flush=True,
    )

    n_items = args.movies + 1
    pop = eval_popularity(train, test_pairs, seen, args.k, n_items=n_items)
    print(f"popularity           recall@{args.k} = {pop:.4f}", flush=True)
    rt = eval_two_tower_retrieval(
        train, test_pairs, seen, args.k, args.epochs,
        n_items=n_items, user_buckets=args.users + 1,
    )
    print(f"two_tower(retrieval) recall@{args.k} = {rt:.4f}", flush=True)
    i2v = None
    if args.item2vec:
        i2v = eval_item2vec(train, test_pairs, seen, args.k, n_items=n_items)
        print(f"item2vec (ref recipe) recall@{args.k} = {i2v:.4f}", flush=True)
    out = {
        "k": args.k,
        "protocol": "leave-one-out, seen-items excluded (identical to recall.json)",
        "dataset": f"synthetic {args.events} events, "
                   f"{args.users}x{args.movies}, planted biased low-rank, "
                   f"base_rating={args.base_rating}",
        "backend": jax.devices()[0].platform,
        "popularity": pop,
        "two_tower_retrieval": rt,
        "lift_over_popularity": round(rt / max(pop, 1e-9), 2),
    }
    if i2v is not None:
        out["item2vec"] = i2v
    print(json.dumps(out), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
