"""Long-history DIN/DIEN end-to-end demonstration.

SURVEY.md §5: the reference caps behaviour sequences at 5 (`DIN.py:31`,
unrolled AUGRU `range(5)` at `DIEN.py:254`). Here history length is a
config: the feature pipeline emits T history columns, DIN consumes them
through the fused attention unit (Pallas auto-selected for T >= 32), and
DIEN's scan-based GRU/AUGRU run the same T without recompiling per step.

    python tools/long_history_demo.py [--t 64] [--epochs 3]
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
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args()

    import jax

    from sparrowrecsys_tpu.config import DataConfig, TrainConfig
    from sparrowrecsys_tpu.data.dataset import encode_samples, standardize
    from sparrowrecsys_tpu.data.feature_pipeline import build_samples, split_samples
    from sparrowrecsys_tpu.data.movielens import load_movies, load_ratings
    from sparrowrecsys_tpu.data.negatives import add_dien_negatives
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.models.dien import dien_loss_fn
    from sparrowrecsys_tpu.training.loop import Trainer

    data = DataConfig()
    catalog = load_movies(data.path(data.movies_csv))
    ratings = load_ratings(data.path(data.ratings_csv))

    t0 = time.perf_counter()
    table = build_samples(ratings, catalog, history_length=args.t)
    train_t, test_t = split_samples(table, seed=2024)
    train_ds, test_ds = standardize(
        encode_samples(train_t), encode_samples(test_t)
    )
    out = {
        "t": args.t,
        "pipeline_s": round(time.perf_counter() - t0, 1),
        "rows": len(table),
        "backend": jax.devices()[0].platform,
    }
    print(f"pipeline T={args.t}: {len(table)} rows", flush=True)

    for name in ("din", "dien"):
        model = build_model(name, recent_movies=args.t)
        loss_fn = None
        tr_d, te_d = train_ds, test_ds
        if name == "dien":
            tr_d = add_dien_negatives(train_ds, 2020, recent_movies=args.t)
            te_d = add_dien_negatives(test_ds, 2021, recent_movies=args.t)
            loss_fn = dien_loss_fn(aux_mode="paper")
            model = build_model(
                name, recent_movies=args.t, aux_mode="paper"
            )
        trainer = Trainer(
            model,
            TrainConfig(batch_size=args.batch_size, epochs=args.epochs),
            loss_fn=loss_fn,
        )
        t0 = time.perf_counter()
        res = trainer.fit(tr_d, test=te_d, verbose=False)
        out[name] = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "examples_per_sec": round(res.examples_per_sec, 1),
            "test_roc_auc": round(res.eval_metrics["roc_auc"], 4),
            "test_pr_auc": round(res.eval_metrics["pr_auc"], 4),
        }
        print(f"{name} T={args.t}: {out[name]}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
