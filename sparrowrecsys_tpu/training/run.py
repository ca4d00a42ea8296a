"""CLI training entry: the TPU-native analogue of running a reference
script like `python TFRecModel/.../EmbeddingMLP.py`.

    python -m sparrowrecsys_tpu.training.run --model embedding_mlp --epochs 5

Builds samples from the bundled data (or --train/--test CSVs in the
reference 27-column format), trains the named zoo model, prints
loss/accuracy/ROC-AUC/PR-AUC, and shows 12 sample predictions like the
reference scripts' trailing printout (`EmbeddingMLP.py:101-105`).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="embedding_mlp")
    # epochs/lr/seed default to None so a --config file's train.* values
    # are honored unless the flag is actually passed ("flags override").
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--parity", action="store_true",
                    help="reference-parity settings (batch=12)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--train", default=None, help="trainingSamples.csv path")
    ap.add_argument("--test", default=None, help="testSamples.csv path")
    ap.add_argument("--standardize", action="store_true",
                    help="z-score numerics with train stats (non-parity)")
    ap.add_argument("--config", default=None,
                    help="JSON config file (config_from_json); CLI flags override")
    ap.add_argument("--data-root", default=None)
    ap.add_argument(
        "--export", default=None, metavar="DIR",
        help="export a versioned checkpoint (NeuralCF.py:106-114 parity: "
        "e.g. data/modeldata/neuralcf -> .../NNN/)",
    )
    ap.add_argument(
        "--state-dir", default=None, metavar="DIR",
        help="checkpoint the FULL train state (params + Adam moments + "
        "epoch cursor) here every --checkpoint-every epochs",
    )
    ap.add_argument("--checkpoint-every", type=int, default=1)
    ap.add_argument(
        "--resume", action="store_true",
        help="restore the newest state under --state-dir and continue; "
        "bitwise-identical to the uninterrupted run (epoch-keyed shuffle)",
    )
    args = ap.parse_args()

    from sparrowrecsys_tpu.config import DataConfig, TrainConfig, config_from_json
    from sparrowrecsys_tpu.data.dataset import encode_samples, load_samples
    from sparrowrecsys_tpu.data.negatives import add_dien_negatives
    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.models.dien import dien_loss_fn
    from sparrowrecsys_tpu.training.loop import Trainer

    file_cfg = config_from_json(args.config) if args.config else None
    data = (
        file_cfg.data if file_cfg and args.data_root is None
        else (DataConfig() if args.data_root is None else DataConfig(data_root=args.data_root))
    )
    train_csv = args.train or data.path("trainingSamples.csv")
    test_csv = args.test or data.path("testSamples.csv")
    train_ds = encode_samples(load_samples(train_csv))
    test_ds = encode_samples(load_samples(test_csv))
    if args.standardize:
        from sparrowrecsys_tpu.data.dataset import standardize

        train_ds, test_ds = standardize(train_ds, test_ds)
    print(f"train={len(train_ds)} test={len(test_ds)} model={args.model}")

    loss_fn = None
    if args.model == "dien":
        # Reference seeds 2020 (train) / 2021 (test), DIEN.py:52-53.
        train_ds = add_dien_negatives(train_ds, seed=2020)
        test_ds = add_dien_negatives(test_ds, seed=2021)
        loss_fn = dien_loss_fn()

    base = file_cfg.train if file_cfg else TrainConfig()
    batch = args.batch_size or (12 if args.parity else base.batch_size)
    import dataclasses as _dc

    overrides = {"batch_size": batch}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.seed is not None:
        overrides["seed"] = args.seed
    cfg = _dc.replace(base, **overrides)
    model = build_model(args.model)
    trainer = Trainer(model, cfg, loss_fn=loss_fn)
    result = trainer.fit(
        train_ds, test=test_ds,
        state_dir=args.state_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )

    if args.export:
        from sparrowrecsys_tpu.training.checkpoint import save

        vdir = save(
            result.params,
            args.export,
            meta={"model": args.model, "metrics": result.eval_metrics},
            keep=cfg.checkpoint_keep,
        )
        print(f"exported checkpoint: {vdir}")

    probs = trainer.predict(result.params, test_ds)[:12]
    labels = test_ds.labels[:12]
    for p, l in zip(probs, labels):
        print(
            f"Predicted good rating: {p:.2%}  | Actual rating label: "
            + ("Good Rating" if l > 0.5 else "Bad Rating")
        )
    print(f"throughput: {result.examples_per_sec:.0f} examples/s")


if __name__ == "__main__":
    main()
