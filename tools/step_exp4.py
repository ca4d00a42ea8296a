"""Experiment 4 (post packed-gather): re-measure the one-hot-backward
threshold and batch scaling on the REAL trainer epoch.

    python tools/step_exp4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sparrowrecsys_tpu.ops.embedding as emb
from __graft_entry__ import _example_features
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync


def measure(batch, steps, onehot_max):
    emb.ONEHOT_GRAD_MAX_VOCAB = onehot_max
    model = build_model("deepfm")
    n = batch * steps
    feats = _example_features(n)
    labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    trainer = Trainer(model, TrainConfig(batch_size=batch, epochs=1))
    trainer._build_steps()
    params = trainer.init_params(ds.features)
    opt_state = trainer.tx.init(params)
    mstate = M.init_metrics()
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels_d = jnp.asarray(ds.labels)
    params, opt_state, mstate = trainer._train_epoch(
        params, opt_state, mstate, data, labels_d,
        jax.random.PRNGKey(0), n=n, batch_size=batch, shuffle=True,
    )
    hard_sync(params)
    best = float("inf")
    for it in range(3):
        t0 = time.perf_counter()
        params, opt_state, mstate = trainer._train_epoch(
            params, opt_state, mstate, data, labels_d,
            jax.random.PRNGKey(1 + it), n=n, batch_size=batch, shuffle=True,
        )
        hard_sync(params)
        best = min(best, time.perf_counter() - t0)
    print(
        f"batch={batch:<7} onehot_max={onehot_max:<6} "
        f"{best/steps*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s"
    )


def main():
    print("backend:", jax.devices()[0].platform)
    for batch, steps, onehot_max in [
        (8192, 64, 2048),
        (8192, 64, 0),       # all-scatter backward
        (32768, 32, 2048),
        (32768, 32, 0),
    ]:
        measure(batch, steps, onehot_max)


if __name__ == "__main__":
    main()
