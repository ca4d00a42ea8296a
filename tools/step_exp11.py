"""A/B: DIEN merged [B, 2T] movie gather vs three separate gathers.

The merged-gather commit measured DIN only (+1.6%); the first post-change
DIEN zoo run read 12.5 ms/step vs the 9.24 pre-change table row, which is
outside DIN's same-run drift — this tool settles it with an interleaved
same-process A/B (both variants compiled once, then alternated, forced
sync, best-of-3 each).

    python tools/step_exp11.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def make(merged: bool):
    trainer = Trainer(
        build_model("dien", merged_gather=merged),
        TrainConfig(batch_size=BATCH, epochs=1),
        loss_fn=dien_loss_fn(),
    )
    trainer._build_steps()
    return trainer


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    runs = {}
    for merged in (True, False):
        tr = make(merged)
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        runs[merged] = (tr, carry)
    # Interleave so tunnel phase hits both equally.
    best = {True: float("inf"), False: float("inf")}
    for i in range(3):
        for merged in (True, False):
            tr, carry = runs[merged]
            t0 = time.perf_counter()
            carry = tr._train_epoch(
                *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            best[merged] = min(best[merged], time.perf_counter() - t0)
            runs[merged] = (tr, carry)
    for merged in (True, False):
        b = best[merged]
        print(
            f"merged={merged!s:<5} {b/STEPS*1e3:7.3f} ms/step "
            f"{n/b/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
