"""Quality A/B for bf16 big-table Adam moments (TrainConfig.big_moment_dtype).

The perf side is measured: bf16 mu/nu on the two big embedding tables
save 2.1 ms of the 64.8 ms MFU-shape step (tools/mfu_attrib.py,
BASELINE.md "MFU residual ATTRIBUTED") — recorded as an OPTION pending
this quality check. The risk mechanism: nu accumulates with beta2=0.999,
so a bf16 (8-bit-mantissa) second moment can lose small (g*g) increments
(stochastic-rounding-free truncation), mis-scaling per-row learning
rates late in training.

Protocol: planted-signal data whose label flows through the ID
embeddings (sequence generator: taste x movie compatibility — the
movie table's rows carry the signal, so mis-scaled table updates show
up in AUC), thousands of optimizer steps, N seeds, fp32 vs bf16
moments, same everything else. CPU (this is a numerics A/B, not a
throughput one).

    python tools/moment_dtype_ab.py [--seeds 3] [--n 300000]
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
from sparrowrecsys_tpu.data.synthetic import sequence_ctr_with_oracle
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops.metrics import exact_auc
from sparrowrecsys_tpu.training.loop import Trainer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--test-n", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--models", default="embedding_mlp,deepfm")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    total = args.n + args.test_n
    full, oracle = sequence_ctr_with_oracle(total, seed=7)
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
                cfg = TrainConfig(batch_size=args.batch_size,
                                  epochs=args.epochs, seed=seed,
                                  big_moment_dtype=dtype)
                t0 = time.perf_counter()
                res = Trainer(build_model(name), cfg).fit(
                    train_ds, test=test_ds, verbose=False
                )
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
