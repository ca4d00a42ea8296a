"""Export versioned checkpoints for the FULL model zoo.

Reference-asset parity (SURVEY.md §2.6): the reference ships FIVE exported
versions of its MLP model (`webroot/modeldata/MLPRec/001-005/`) and two of
neuralcf (`webroot/modeldata/neuralcf/001-002/`, export at
`NeuralCF.py:106-114`). This tool produces the analogous artifact tree
under `data/modeldata/<model>/NNN/` for every zoo model:

- embedding_mlp: a REAL 5-version chain — one export per training epoch
  (MLPRec/001-005 layout parity; each version is the genuine epoch-k
  params of one continuous run, not five re-inits).
- dien: a 6-snapshot chain exported with keep=5, so version 001 is
  PRUNED on the final save — the keep-N policy exercised on a real
  artifact chain (TrainConfig.checkpoint_keep).
- every other model: final params as 001 (002+ appear whenever a newer
  run exports — the hot-reload watcher picks them up live).

Trains on the vendored trainingSamples.csv (the reference recipe:
5 epochs, Adam, BCE) on the CPU backend so it never queues behind TPU
jobs; meta.json records the model name, epoch, and eval metrics.

Run: python tools/export_zoo.py [--models a,b,...] [--out data/modeldata]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env vars can't (CLAUDE.md)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sparrowrecsys_tpu.config import DataConfig, TrainConfig  # noqa: E402
from sparrowrecsys_tpu.data.dataset import encode_samples, load_samples_csv  # noqa: E402
from sparrowrecsys_tpu.data.negatives import add_dien_negatives  # noqa: E402
from sparrowrecsys_tpu.models import MODEL_REGISTRY, build_model  # noqa: E402
from sparrowrecsys_tpu.models.dien import dien_loss_fn  # noqa: E402
from sparrowrecsys_tpu.training import checkpoint  # noqa: E402
from sparrowrecsys_tpu.training.loop import Trainer  # noqa: E402

#: per-epoch export chains: {model: (n_epochs, keep)} — others export the
#: final params once.
CHAINS = {"embedding_mlp": (5, None), "dien": (6, 5)}


def export_model(name: str, train_ds, test_ds, out_root: str, epochs: int = 5):
    loss_fn = dien_loss_fn() if name == "dien" else None
    tr = train_ds
    te = test_ds
    if name == "dien":
        tr = add_dien_negatives(tr, seed=2020)  # DIEN.py:52-53 seeds
        te = add_dien_negatives(te, seed=2021)
    chain = CHAINS.get(name)
    # Chain exports read EVERY state version back, so the trainer's own
    # state pruning (checkpoint_keep, applied in fit) must not outrun the
    # chain length; pruning is then exercised at EXPORT time via keep.
    keep_states = chain[0] if chain else TrainConfig().checkpoint_keep
    # Parity batch=12 (the reference recipe, EmbeddingMLP.py:14-22): the
    # bundled sample undertrains feature-heavy models at big batches
    # (embedding_mlp measured AUC 0.38 at batch 512 vs ~0.69 at 12).
    cfg = TrainConfig(batch_size=12, epochs=epochs, checkpoint_keep=keep_states)
    trainer = Trainer(build_model(name), cfg, loss_fn=loss_fn)
    mdir = os.path.join(out_root, name)
    if chain is None:
        result = trainer.fit(tr, test=te, verbose=False)
        vdir = checkpoint.save(
            result.params, mdir,
            meta={"model": name, "epochs": epochs,
                  "metrics": result.eval_metrics},
        )
        print(f"{name}: exported {vdir}  metrics={result.eval_metrics}")
        return

    n_epochs, keep = chain
    # Per-epoch chain via the trainer's own state checkpointing (one
    # continuous optimizer trajectory), then params-only exports per
    # version — the reference's MLPRec/001-005 artifact shape.
    import tempfile

    with tempfile.TemporaryDirectory() as state_dir:
        result = trainer.fit(
            tr, test=te, epochs=n_epochs, verbose=False,
            state_dir=state_dir, checkpoint_every=1,
        )
        params_target = result.params
        for v in range(1, n_epochs + 1):
            params, meta = checkpoint.load_version(state_dir, v, params_target)
            vdir = checkpoint.save(
                params, mdir,
                version=v,
                meta={"model": name, "epoch": v,
                      "final_metrics": result.eval_metrics},
                keep=keep,
            )
            print(f"{name}: exported {vdir}")
    kept = sorted(os.listdir(mdir))
    print(f"{name}: versions on disk after keep={keep}: {kept}  "
          f"metrics={result.eval_metrics}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None,
                    help="comma-separated subset (default: all missing)")
    ap.add_argument("--out", default=None, help="default <data_root>/modeldata")
    ap.add_argument("--force", action="store_true",
                    help="re-export even if the model already has versions")
    args = ap.parse_args()

    data = DataConfig()
    out_root = args.out or data.path("modeldata")
    train_ds = encode_samples(load_samples_csv(data.path("trainingSamples.csv")))
    test_ds = encode_samples(load_samples_csv(data.path("testSamples.csv")))
    print(f"train={len(train_ds)} test={len(test_ds)} -> {out_root}")

    names = args.models.split(",") if args.models else list(MODEL_REGISTRY)
    for name in names:
        mdir = os.path.join(out_root, name)
        if not args.force and os.path.isdir(mdir) and os.listdir(mdir):
            print(f"{name}: already exported ({sorted(os.listdir(mdir))}), skipping")
            continue
        export_model(name, train_ds, test_ds, out_root)


if __name__ == "__main__":
    main()
