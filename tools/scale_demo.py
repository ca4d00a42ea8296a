"""MovieLens-20M-scale end-to-end demonstration.

SURVEY.md §7 step 8 / BASELINE.md: the 20M pipeline can't be downloaded
(zero egress), so this drives the full offline->train path on synthetic
data with 20M-class shape: generate events -> (optionally) round-trip the
native C++ CSV loader -> vectorized 27-column feature pipeline -> encode ->
device-resident DeepFM training epoch on the TPU. Prints one JSON summary
with stage wall-times and training throughput.

    python tools/scale_demo.py --events 20000000 [--csv] [--epochs 1]
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
    ap.add_argument("--csv", action="store_true",
                    help="round-trip ratings through the native C++ loader")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--train-rows", type=int, default=4_000_000,
                    help="cap rows fed to the training stage")
    ap.add_argument("--device-features", action="store_true",
                    help="run the 27-column feature pipeline ON the TPU "
                         "(data/device_pipeline.py; bit-identical output, "
                         "measured 39x the host pipeline at 5M events)")
    ap.add_argument("--sharded", default=None, metavar="DxM",
                    help="train over a (data x model) mesh with row-sharded "
                         "embedding tables, e.g. 4x2 (BASELINE.json config "
                         "#5; on this environment the mesh is virtual CPU "
                         "devices — set XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=N)")
    args = ap.parse_args()

    if args.sharded:
        # Must pin the backend BEFORE the first jax device query: the
        # image's sitecustomize pins axon (1 device) and env vars can't
        # override it (CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sparrowrecsys_tpu.data.feature_pipeline import build_samples
    from sparrowrecsys_tpu.data.movielens import MovieCatalog
    from sparrowrecsys_tpu.data.dataset import encode_samples
    from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings

    out = {"events": args.events}

    t0 = time.perf_counter()
    ratings = synthetic_ratings(
        SyntheticSpec(args.users, args.movies, args.events)
    )
    out["gen_s"] = round(time.perf_counter() - t0, 1)
    print(f"generated {len(ratings)} events in {out['gen_s']}s", flush=True)

    if args.csv:
        from sparrowrecsys_tpu.data.movielens import write_ratings_csv
        from sparrowrecsys_tpu.native import load_ratings_native, native_available

        path = "/tmp/scale_ratings.csv"
        t0 = time.perf_counter()
        write_ratings_csv(ratings, path)
        out["csv_write_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        ratings = load_ratings_native(path)
        out["csv_native_load_s"] = round(time.perf_counter() - t0, 1)
        out["native"] = native_available()
        print(
            f"csv round-trip: write {out['csv_write_s']}s, "
            f"native load {out['csv_native_load_s']}s", flush=True,
        )
        os.unlink(path)

    ids = np.arange(1, args.movies + 1, dtype=np.int32)
    catalog = MovieCatalog(
        movie_ids=ids,
        titles=[f"Movie {i}" for i in ids],
        release_years=(1950 + ids % 70).astype(np.int32),
        genres=[["Action", "Drama"] if i % 2 else ["Comedy"] for i in ids],
        id_to_row={int(i): k for k, i in enumerate(ids)},
        genre_index={},
    )
    t0 = time.perf_counter()
    if args.device_features:
        # Fully resident: events -> 27 columns -> encoded tensors, all in
        # HBM; the only host reads are two scalars (row counts). Feature
        # time and encode time fuse into one stage here.
        from sparrowrecsys_tpu.data.device_pipeline import (
            device_feature_columns,
            encode_samples_device,
        )

        cols = device_feature_columns(ratings, catalog)
        ds = encode_samples_device(cols, max_rows=args.train_rows)
        out["feature_pipeline"] = "device-resident"
        out["feature_pipeline_s"] = round(time.perf_counter() - t0, 1)
        out["sample_rows"] = len(ds)
        out["encode_s"] = 0.0
        print(
            f"device-resident features+encode: {len(ds)} rows in "
            f"{out['feature_pipeline_s']}s", flush=True,
        )
    else:
        table = build_samples(ratings, catalog)
        out["feature_pipeline_s"] = round(time.perf_counter() - t0, 1)
        out["sample_rows"] = len(table)
        print(
            f"feature pipeline: {len(table)} x 27 columns in "
            f"{out['feature_pipeline_s']}s", flush=True,
        )

        t0 = time.perf_counter()
        if len(table) > args.train_rows:
            table = table.select(np.arange(args.train_rows))
        ds = encode_samples(table)
        out["encode_s"] = round(time.perf_counter() - t0, 1)

    import jax

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.training.loop import Trainer

    model = build_model(
        "deepfm", user_buckets=args.users + 1, movie_buckets=args.movies + 1
    )
    plan = None
    if args.sharded:
        from sparrowrecsys_tpu.config import MeshConfig
        from sparrowrecsys_tpu.parallel.mesh import build_mesh

        dp, mp = (int(x) for x in args.sharded.lower().split("x"))
        plan = build_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))
        out["mesh"] = f"{dp}x{mp}"
    trainer = Trainer(
        model, TrainConfig(batch_size=args.batch_size, epochs=args.epochs),
        plan=plan,
    )
    trainer.device_resident_bytes = 8 << 30
    # Held-out eval (random split like the reference's 80/20,
    # FeatureEngForRecModel.scala:195-212 — rows arrive grouped by user,
    # so a tail split would make every eval user cold): train AUC alone
    # can't distinguish learning from memorization at this scale.
    from sparrowrecsys_tpu.data.dataset import EncodedDataset

    n_rows = len(ds)
    n_test = min(500_000, n_rows // 10)
    perm = np.random.default_rng(0).permutation(n_rows)
    te, tr_idx = perm[:n_test], perm[n_test:]
    ds_test = EncodedDataset(
        {k: v[te] for k, v in ds.features.items()}, ds.labels[te]
    )
    ds = EncodedDataset(
        {k: v[tr_idx] for k, v in ds.features.items()}, ds.labels[tr_idx]
    )
    t0 = time.perf_counter()
    res = trainer.fit(ds, test=ds_test, verbose=False)
    out["train_s"] = round(time.perf_counter() - t0, 1)
    out["train_examples_per_sec"] = round(res.examples_per_sec, 1)
    out["final_roc_auc"] = round(res.history[-1]["roc_auc"], 4)
    out["eval_roc_auc"] = round(res.eval_metrics["roc_auc"], 4)
    out["eval_rows"] = int(n_test)
    out["backend"] = jax.devices()[0].platform
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
