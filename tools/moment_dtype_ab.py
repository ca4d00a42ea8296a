"""Quality A/B for bf16 big-table Adam moments (TrainConfig.big_moment_dtype).

The perf side is measured: bf16 mu/nu on the two big embedding tables
save 2.1 ms of the 64.8 ms MFU-shape step (tools/mfu_attrib.py,
BASELINE.md "MFU residual ATTRIBUTED") — recorded as an OPTION pending
this quality check. The risk mechanism: nu accumulates with beta2=0.999,
so a bf16 (8-bit-mantissa) second moment can lose small (g*g) increments
(stochastic-rounding-free truncation), mis-scaling per-row learning
rates late in training.

Protocol: the planted signal must flow through a table whose moments
are actually narrowed — a BIG leaf (> optim.SMALL_LEAF_MAX_ELEMS
elements; at the default dim 10 that means vocab > ~6.6k). The label is
a pure per-movie-id logit over a 2^16 vocab (the movie table IS the
model's only path to it), with ZIPF-distributed ids: head rows update
thousands of times (beta2=0.999 nu accumulation — where bf16
truncation of small (g*g) increments bites), tail rows a handful
(tiny-nu regime). Thousands of optimizer steps, N seeds, fp32 vs bf16
moments, same everything else. CPU (this is a numerics A/B, not a
throughput one).

A first protocol used the sequence generator at 300k rows — every
model sat at chance (0.50) there, so the A/B measured nothing; and its
signal path (userId random, movie vocab 1001 -> SMALL leaf, fp32
moments either way) never touched the narrowed state. Kept here as a
warning: an A/B whose baseline doesn't learn can't clear an option.

    python tools/moment_dtype_ab.py [--seeds 3] [--n 1000000]
        [--models embedding_mlp,deepfm]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops.metrics import exact_auc
from sparrowrecsys_tpu.training.loop import Trainer


def per_id_ctr(n: int, vocab: int, seed: int = 7, zipf_a: float = 1.3,
               gain: float = 2.0):
    """Labels ~ sigmoid(gain * w[movieId]), ids Zipf over [1, vocab).
    Every other column is noise — the movie table is the only signal
    path. Returns (EncodedDataset, oracle_logits)."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=vocab).astype(np.float32)
    ids = rng.zipf(zipf_a, size=4 * n).astype(np.int64)
    ids = ids[ids < vocab][:n].astype(np.int32)
    assert ids.shape[0] == n, "raise the 4x oversample for this zipf_a"
    logit = gain * w[ids]
    labels = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(
        np.float32
    )
    feats = {
        "movieId": ids,
        "userId": rng.integers(1, 30001, n).astype(np.int32),
    }
    for c in ("userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
              "userRatedMovie4", "userRatedMovie5"):
        feats[c] = rng.integers(0, 1001, n).astype(np.int32)
    for c in ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
              "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3"):
        feats[c] = rng.integers(-1, 19, n).astype(np.int32)
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = rng.normal(size=n).astype(np.float32)
    return EncodedDataset(feats, labels), logit


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--test-n", type=int, default=200_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=1 << 16)
    ap.add_argument("--models", default="embedding_mlp,deepfm")
    ap.add_argument("--ab", default="moments",
                    choices=("moments", "lookup", "params"),
                    help="which option to A/B: 'moments' = bf16 big-table "
                    "Adam moments; 'lookup' = IdEmbed lookup_dtype "
                    "bfloat16 (cast-before-gather, fp32 master — "
                    "embedding_mlp only); 'params' = "
                    "TrainConfig.bf16_table_params (bf16 table storage "
                    "with fp32 master weights)")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    total = args.n + args.test_n
    full, oracle = per_id_ctr(total, args.vocab)
    tr_f, tr_l = full.slice(np.arange(args.n))
    te_f, te_l = full.slice(np.arange(args.n, total))
    train_ds = EncodedDataset(tr_f, tr_l)
    test_ds = EncodedDataset(te_f, te_l)
    o = exact_auc(1 / (1 + np.exp(-oracle[args.n:])), te_l)
    print(f"oracle roc: {o['roc_auc']:.4f}  "
          f"steps/run: {args.n // args.batch_size * args.epochs}", flush=True)

    results = {}
    for name in args.models.split(","):
        for dtype in ("float32", "bfloat16"):
            aucs = []
            for seed in range(args.seeds):
                cfg = TrainConfig(
                    batch_size=args.batch_size, epochs=args.epochs,
                    seed=seed,
                    big_moment_dtype=(
                        dtype if args.ab == "moments" else "float32"
                    ),
                    bf16_table_params=(
                        args.ab == "params" and dtype == "bfloat16"
                    ),
                )
                kw = {"movie_buckets": args.vocab}
                if args.ab == "lookup":
                    kw["lookup_dtype"] = (
                        None if dtype == "float32" else "bfloat16"
                    )
                t0 = time.perf_counter()
                res = Trainer(
                    build_model(name, **kw), cfg
                ).fit(train_ds, test=test_ds, verbose=False)
                auc = res.eval_metrics["roc_auc"]
                aucs.append(auc)
                print(f"{name}/{dtype} seed {seed}: roc={auc:.4f} "
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
            a = np.asarray(aucs)
            results[f"{name}/{dtype}"] = {
                "mean": float(a.mean()), "std": float(a.std()),
                "seeds": [float(x) for x in aucs],
            }
        d = (results[f"{name}/bfloat16"]["mean"]
             - results[f"{name}/float32"]["mean"])
        print(f"{name}: bf16 - fp32 = {d:+.4f}", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"config": vars(args), "oracle_roc": o["roc_auc"],
                       "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
