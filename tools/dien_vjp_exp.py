"""A/B: DIEN hand-written recurrence backward vs lax.scan autodiff.

VERDICT r2 item #1: DIEN's step is ~45% backward through the scanned
GRU/AUGRU (BASELINE.md "DIEN step decomposition"). ops/augru.py's custom
VJPs keep only the dh-propagation matmuls inside the backward scan and
compute every recurrent-weight gradient as ONE flattened [T*B, H] matmul
outside it. Same interleaved same-process protocol as step_exp11: both
variants compiled once, then alternated, forced sync, best-of-N each.

    python tools/dien_vjp_exp.py
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


def make(custom: bool):
    trainer = Trainer(
        build_model("dien", recurrence_custom_vjp=custom),
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
    for custom in (True, False):
        tr = make(custom)
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        runs[custom] = (tr, carry)
    best = {True: float("inf"), False: float("inf")}
    for i in range(4):
        for custom in (True, False):
            tr, carry = runs[custom]
            t0 = time.perf_counter()
            carry = tr._train_epoch(
                *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            best[custom] = min(best[custom], time.perf_counter() - t0)
            runs[custom] = (tr, carry)
    for custom in (True, False):
        b = best[custom]
        print(
            f"custom_vjp={custom!s:<5} {b/STEPS*1e3:7.3f} ms/step "
            f"{n/b/1e6:7.2f}M ex/s",
            flush=True,
        )
    print(f"speedup: {best[False]/best[True]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
