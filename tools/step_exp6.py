"""Experiment 6: bf16 compute for the TRAINING step at large batch.

Post packed-gather + group-fused Adam the step is per-element bound in
the dense tower (BASELINE.md roofline: batch 32k+ scales with batch, not
fixed overhead). bf16 was a measured negative for retrieval top-k (the
top_k dominates there), but the training deep tower is matmul+elementwise
— exactly where bf16 halves bytes and doubles MXU rate. Params, loss,
logits, and Adam state stay fp32 (`compute_dtype` only casts the deep
Dense compute, models/deepfm.py:90-94) so quality parity is expected by
construction; PARITY bands police it.

Also re-checks batch 131072 (the 65536 plateau might move in bf16).

    python tools/step_exp6.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync


def measure(batch, steps, compute_dtype, label):
    model = build_model("deepfm", compute_dtype=compute_dtype)
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
        f"{label:<24} batch={batch:<7} "
        f"{best/steps*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s"
    )


def main():
    print("backend:", jax.devices()[0].platform)
    for batch, steps, dt in [
        (65536, 16, "float32"),    # current bench config (control)
        (65536, 16, "bfloat16"),
        (131072, 8, "float32"),
        (131072, 8, "bfloat16"),
    ]:
        measure(batch, steps, dt, f"deepfm/{dt}")


if __name__ == "__main__":
    main()
