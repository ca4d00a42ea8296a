"""ALS collaborative filtering at MovieLens-20M scale on one TPU chip.

The reference runs Spark ML ALS on a cluster
(`offline/spark/model/CollaborativeFiltering.scala:48-77`); this drives
the TPU rebuild (`models/als.py` — batched normal-equation solves, with
chunked Gram accumulation above 4M events so the [N, k, k] outer
products never materialize) on the planted-structure synthetic dataset
at 20M-class shape, and records iteration wall time + held-out RMSE.

    python tools/als_scale.py [--events 20000000] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--users", type=int, default=138_000)
    ap.add_argument("--movies", type=int, default=27_000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    from sparrowrecsys_tpu.data.movielens import Ratings
    from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings
    from sparrowrecsys_tpu.models.als import ALSConfig, train_als

    out = {"events": args.events, "backend": jax.devices()[0].platform}
    t0 = time.perf_counter()
    ratings = synthetic_ratings(
        SyntheticSpec(args.users, args.movies, args.events)
    )
    out["gen_s"] = round(time.perf_counter() - t0, 1)
    print(f"generated {len(ratings)} events in {out['gen_s']}s", flush=True)

    # Reference protocol: random 80/20 split (CollaborativeFiltering.scala:48).
    rng = np.random.default_rng(0)
    test_mask = rng.random(len(ratings)) < 0.2

    def pick(sel):
        return Ratings(
            ratings.user_ids[sel], ratings.movie_ids[sel],
            ratings.ratings[sel], ratings.timestamps[sel],
        )

    train, test = pick(~test_mask), pick(test_mask)
    out["train_events"] = len(train)
    out["test_events"] = len(test)

    t0 = time.perf_counter()
    model = train_als(train, ALSConfig(max_iter=args.iters))
    out["train_s"] = round(time.perf_counter() - t0, 1)
    out["s_per_iter"] = round(out["train_s"] / args.iters, 1)
    print(
        f"ALS {args.iters} iters in {out['train_s']}s "
        f"({out['s_per_iter']}s/iter)", flush=True,
    )

    t0 = time.perf_counter()
    out["test_rmse"] = round(model.rmse(test), 4)
    out["train_rmse"] = round(model.rmse(train), 4)
    out["rmse_s"] = round(time.perf_counter() - t0, 1)
    # The planted model's irreducible noise is 0.3 (plus the 0.5-grid
    # rounding): an RMSE near ~0.33 means the factorization is recovered.
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
