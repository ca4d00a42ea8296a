"""Do DIN/DIEN actually extract *sequential* signal? (VERDICT r2 #3)

The reference's architectural claim for DIN is that target attention over
the behavior history beats pooled/flat features (`TFRecModel/.../DIN.py:
144-163`), and DIEN's that an order-aware GRU/AUGRU beats permutation-
invariant pooling (`DIEN.py:181-262`). Neither can show it on the bundled
sample (all models crowd into 0.64-0.73) nor on the marginal-biased 20M
synthetic (no history->candidate interaction planted).

This experiment trains the zoo on two generators from
`sparrowrecsys_tpu/data/synthetic.py`:

- `sequence`: label depends ONLY on a recency-decayed planted item-item
  compatibility between history and candidate (zero marginal signal).
  Expected ordering: oracle > DIEN (order-aware) >= DIN (sees the
  compatibility, blind to the decay) >> DeepFM == EmbeddingMLP == 0.5
  (no history channel).
- `marginal`: the existing generator whose signal lives in per-row
  numerics — every model should tie.

Held-out AUC is exact (Mann-Whitney); the oracle row scores the planted
Bayes logit on the same test slice.

    python tools/seq_signal.py [--n 2000000] [--seeds 3] [--epochs 3]
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
    ap.add_argument("--n", type=int, default=2_000_000, help="train rows")
    ap.add_argument("--test-n", type=int, default=500_000)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--models", default="embedding_mlp,deepfm,din,dien")
    ap.add_argument("--datasets", default="sequence,marginal")
    ap.add_argument("--json-out", default="seq_signal.json")
    # Planted-signal knobs (see synthetic.py::_sequence_ctr). compat_dim=4 /
    # gain=4 makes the rank-4 kernel learnable within a few epochs while
    # keeping the oracle ceiling ~0.93.
    ap.add_argument("--t", type=int, default=5,
                    help="generator history length (userRatedMovie1..t)")
    ap.add_argument("--model-t", type=int, default=0,
                    help="history length DIN/DIEN consume (recent_movies); "
                    "0 = same as --t. Setting it below --t truncates the "
                    "model's view to the most recent items — the long-"
                    "history capability demonstration")
    ap.add_argument("--compat-dim", type=int, default=4)
    ap.add_argument("--gain", type=float, default=4.0)
    ap.add_argument("--recency", type=float, default=0.6)
    ap.add_argument("--markov-tau", type=float, default=1.5)
    # DIEN aux configuration. The reference-quirk mode (BCE - alpha*aux)
    # diverges over many epochs (it REWARDS unbounded aux scores); the
    # published loss is the claim under test.
    ap.add_argument("--dien-aux", default="paper",
                    choices=("paper", "none", "reference"))
    ap.add_argument("--dien-alpha", type=float, default=0.5)
    ap.add_argument("--dien-aux-norm", default="sum",
                    choices=("sum", "mean"),
                    help="paper-aux aggregation over steps: 'sum' is the "
                    "published form (couples alpha to T); 'mean' is "
                    "per-valid-step so alpha means the same at any T "
                    "(VERDICT r4 #3a)")
    # Interest-drift generator knobs (--datasets drift; see
    # synthetic.py::drift_ctr_with_oracle — the setting where next-step
    # prediction carries signal the terminal label doesn't).
    ap.add_argument("--drift-rho", type=float, default=0.9)
    ap.add_argument("--drift-tau", type=float, default=2.0)
    ap.add_argument("--dien-remat", default="auto",
                    choices=("auto", "on", "off"),
                    help="DIEN recurrence remat: 'auto' is the model "
                    "default (on at T >= 64 since round 5 — changes f32 "
                    "fusion reassociation, so AUC-equivalent but not "
                    "bit-equal to pre-remat runs); 'off' pins the "
                    "pre-round-5 graph for bit-reproduction protocols "
                    "(tools/seed_harden.py pins it).")
    ap.add_argument("--dataset-cache", default="",
                    help="npz path: load the generated dataset from here "
                    "if present, else generate and save. The drift "
                    "generator costs ~90 CPU-minutes at 1.3M x T=64 "
                    "(~84G Gumbel draws) — a 3-run campaign on one "
                    "dataset should pay it once. The cache stores the "
                    "raw generator output; the caller owns keying it to "
                    "the generator config (the campaign scripts bake "
                    "the config into the filename).")
    args = ap.parse_args()

    import jax

    from sparrowrecsys_tpu.config import TrainConfig
    from sparrowrecsys_tpu.data.dataset import EncodedDataset
    from sparrowrecsys_tpu.data.negatives import add_dien_negatives
    from sparrowrecsys_tpu.data.synthetic import (
        drift_ctr_with_oracle, sequence_ctr_with_oracle,
        synthetic_ctr_dataset,
    )
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.models.dien import dien_loss_fn
    from sparrowrecsys_tpu.ops.metrics import exact_auc
    from sparrowrecsys_tpu.training.loop import Trainer

    print("backend:", jax.devices()[0].platform, flush=True)
    total = args.n + args.test_n

    def split(ds: EncodedDataset):
        tr_f, tr_l = ds.slice(np.arange(args.n))
        te_f, te_l = ds.slice(np.arange(args.n, total))
        return EncodedDataset(tr_f, tr_l), EncodedDataset(te_f, te_l)

    def gen_or_cache(gen):
        cache = args.dataset_cache
        if cache and os.path.exists(cache):
            z = np.load(cache)
            oracle = z["__oracle__"]
            labels = z["__labels__"]
            feats = {k: z[k] for k in z.files
                     if not k.startswith("__")}
            print(f"dataset cache hit: {cache}", flush=True)
            return EncodedDataset(feats, labels), oracle
        full, oracle = gen()
        if cache:
            np.savez(cache, __oracle__=oracle, __labels__=full.labels,
                     **full.features)
            print(f"dataset cache written: {cache}", flush=True)
        return full, oracle

    results = {}
    for dname in args.datasets.split(","):
        if dname in ("sequence", "drift"):
            if dname == "drift":
                full, oracle = gen_or_cache(lambda: drift_ctr_with_oracle(
                    total, seed=7, t=args.t, compat_dim=args.compat_dim,
                    gain=args.gain, drift_rho=args.drift_rho,
                    tau=args.drift_tau,
                ))
            else:
                full, oracle = gen_or_cache(lambda: sequence_ctr_with_oracle(
                    total, seed=7, t=args.t, compat_dim=args.compat_dim,
                    gain=args.gain, recency=args.recency,
                    markov_tau=args.markov_tau,
                ))
            train_ds, test_ds = split(full)
            o = exact_auc(1 / (1 + np.exp(-oracle[args.n:])), test_ds.labels)
            oracle_auc = o["roc_auc"]
        else:
            train_ds, test_ds = split(synthetic_ctr_dataset(total, seed=7))
            oracle_auc = None
        rows = {}
        for name in args.models.split(","):
            aucs = []
            for seed in range(args.seeds):
                tr_d, te_d, loss_fn = train_ds, test_ds, None
                model_t = args.model_t or args.t
                if name in ("din", "dien"):
                    model = build_model(name, recent_movies=model_t)
                else:
                    model = build_model(name)
                if name == "dien":
                    tr_d = add_dien_negatives(
                        train_ds, seed=2020 + seed, recent_movies=model_t
                    )
                    te_d = add_dien_negatives(
                        test_ds, seed=2021 + seed, recent_movies=model_t
                    )
                    model = model.copy(
                        aux_mode=args.dien_aux, alpha=args.dien_alpha,
                        aux_norm=args.dien_aux_norm,
                        recurrence_remat={
                            "auto": None, "on": True, "off": False
                        }[args.dien_remat],
                    )
                    loss_fn = dien_loss_fn(
                        alpha=args.dien_alpha, aux_mode=args.dien_aux
                    )
                cfg = TrainConfig(
                    batch_size=args.batch_size, epochs=args.epochs, seed=seed
                )
                t0 = time.perf_counter()
                trainer = Trainer(model, cfg, loss_fn=loss_fn)
                res = trainer.fit(tr_d, test=te_d, verbose=False)
                auc = res.eval_metrics["roc_auc"]
                aucs.append(auc)
                print(
                    f"{dname}/{name} seed {seed}: roc={auc:.4f} "
                    f"({time.perf_counter() - t0:.1f}s)",
                    flush=True,
                )
            a = np.asarray(aucs)
            rows[name] = {
                "mean": float(a.mean()), "std": float(a.std()),
                "seeds": [float(x) for x in aucs],
            }
        results[dname] = {"models": rows, "oracle_roc_auc": oracle_auc}
        if oracle_auc is not None:
            print(f"{dname} oracle roc: {oracle_auc:.4f}", flush=True)

    with open(args.json_out, "w") as f:
        json.dump(
            {
                "config": {
                    "train_rows": args.n, "test_rows": args.test_n,
                    "seeds": args.seeds, "epochs": args.epochs,
                    "batch_size": args.batch_size, "planted_seed": 7,
                    "compat_dim": args.compat_dim, "gain": args.gain,
                    "recency": args.recency, "markov_tau": args.markov_tau,
                    "t": args.t, "model_t": args.model_t or args.t,
                    # Provenance (r4 postmortem): the aux flags MUST be in
                    # the artifact — the withdrawn r3 DIEN rows were
                    # aux-off runs whose flag went unrecorded.
                    "dien_aux": args.dien_aux,
                    "dien_alpha": args.dien_alpha,
                    "dien_aux_norm": args.dien_aux_norm,
                    "dien_remat": args.dien_remat,
                    "drift_rho": args.drift_rho,
                    "drift_tau": args.drift_tau,
                    "models": args.models,
                },
                "results": results,
            },
            f, indent=1,
        )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
