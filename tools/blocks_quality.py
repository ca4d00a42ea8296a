"""Quality probe for `TrainConfig.shuffle_mode="blocks"`.

Block-permuted shuffling is +6% step throughput over the exact
permutation (tools/step_exp7.py) but approximates the shuffle; before it
can ever be a default its AUC must be indistinguishable from exact.
This probe trains zoo models on the bundled sample with both modes at a
block size chosen so blocks-per-batch matches the production regime
(batch 65536 / block 1024 = 64 blocks per batch -> batch 512 / block 8
here; the tiny 3.9k-row sample is the conservative case — production
epochs draw 64 blocks from ~20k, here from ~512).

    python tools/blocks_quality.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sparrowrecsys_tpu.config import DataConfig, TrainConfig
from sparrowrecsys_tpu.data.dataset import encode_samples, load_samples
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer

SEEDS = 3
BATCH = 512
BLOCK = 8


def main():
    data = DataConfig()
    train_ds = encode_samples(load_samples(data.path("trainingSamples.csv")))
    test_ds = encode_samples(load_samples(data.path("testSamples.csv")))
    for name in ("embedding_mlp", "deepfm"):
        for mode in ("exact", "blocks"):
            rocs = []
            for seed in range(SEEDS):
                cfg = TrainConfig(
                    batch_size=BATCH, epochs=5, seed=seed,
                    shuffle_mode=mode, shuffle_block=BLOCK,
                )
                trainer = Trainer(build_model(name), cfg)
                res = trainer.fit(train_ds, test=test_ds, verbose=False)
                rocs.append(res.eval_metrics["roc_auc"])
            r = np.array(rocs)
            print(
                f"{name:<14} {mode:<7} roc={r.mean():.4f} +/- {r.std():.4f}"
                f"  (seeds {list(np.round(r, 4))})"
            )


if __name__ == "__main__":
    main()
