"""Interleaved A/B: DIEN aux heads folded (2 block-diag matmuls) vs
per-head (4 matmuls). Same params either way — the unfolded variant just
monkeypatches `folded_dense` with per-head application.

    python tools/dien_aux_exp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sparrowrecsys_tpu.models.dien as dien_mod
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.models.features import folded_dense
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def per_head(xs, kbs):
    return jnp.concatenate([x @ k + b for x, (k, b) in zip(xs, kbs)], axis=-1)


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    variants = {"folded": folded_dense, "perhead": per_head}
    runs = {}
    for name, fn in variants.items():
        dien_mod.folded_dense = fn
        tr = Trainer(
            build_model("dien"), TrainConfig(batch_size=BATCH, epochs=1),
            loss_fn=dien_loss_fn(),
        )
        tr._build_steps()
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        runs[name] = (tr, carry)
    best = {name: float("inf") for name in variants}
    for i in range(3):
        for name in variants:
            tr, carry = runs[name]
            t0 = time.perf_counter()
            carry = tr._train_epoch(
                *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            best[name] = min(best[name], time.perf_counter() - t0)
            runs[name] = (tr, carry)
    for name, b in best.items():
        print(
            f"{name:<8} {b/STEPS*1e3:7.3f} ms/step {n/b/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
