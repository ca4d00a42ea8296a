"""Headline benchmark: DeepFM training throughput (examples/sec/chip).

BASELINE.json metric: "CTR examples/sec/chip (DeepFM); AUC parity;
retrieval recall@10 + queries/sec". The reference publishes no numbers
(BASELINE.md), so `vs_baseline` is measured against the reference-
equivalent configuration of THIS framework pinned in `BASELINE_LOCAL`
below (first TPU run's number; kept fixed so later rounds show speedup).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer

#: First recorded TPU v5e single-chip number (round 1). Update only with a
#: note in BASELINE.md.
BASELINE_LOCAL = 34_440_610.5  # TPU v5e 1-chip, round-1 first recorded run

BATCH = 8192
STEPS = 60
WARMUP = 5


def main() -> None:
    n_chips = max(1, len(jax.devices()))
    model = build_model("deepfm")
    n = BATCH * 4
    feats = _example_features(n)
    labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)

    trainer = Trainer(model, TrainConfig(batch_size=BATCH, epochs=1))
    trainer._build_steps()
    params = trainer.init_params(ds.features)
    opt_state = trainer.tx.init(params)
    from sparrowrecsys_tpu.ops import metrics as M

    mstate = M.init_metrics()

    batches = list(trainer._batches(ds, BATCH, False, 0))
    # Warmup (compile) then timed steps.
    for i in range(WARMUP):
        f, l, m = batches[i % len(batches)]
        params, opt_state, mstate = trainer._train_step(
            params, opt_state, mstate, f, l, m
        )
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    for i in range(STEPS):
        f, l, m = batches[i % len(batches)]
        params, opt_state, mstate = trainer._train_step(
            params, opt_state, mstate, f, l, m
        )
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0

    eps = BATCH * STEPS / dt / n_chips
    vs = eps / BASELINE_LOCAL if BASELINE_LOCAL else 1.0
    print(
        json.dumps(
            {
                "metric": "deepfm_train_examples_per_sec_per_chip",
                "value": round(eps, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
