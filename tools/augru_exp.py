"""Interleaved A/B: folded AUGRU matmuls vs the per-gate form.

Same lesson as tools/din_exp.py (MXU pads K/N to 128 lanes, so matmul
COUNT dominates at H=10): the AUGRU now hoists ONE [B,T,H]@[H,3H] input
projection and merges the r/z recurrent matmuls per step. This measures
the full DIEN train step both ways in one process.

    python tools/augru_exp.py
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
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.ops.augru import augru as augru_folded
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def augru_pergate(params, states, attention):
    """Round-1 form: three hoisted projections, three per-step matmuls."""
    xr_all = states @ params.r.w + params.r.b
    xz_all = states @ params.z.w + params.z.b
    xh_all = states @ params.h.w + params.h.b

    def step(h, inp):
        xr, xz, xh, at = inp
        r = jax.nn.sigmoid(xr + h @ params.r.u)
        z = jax.nn.sigmoid(xz + h @ params.z.u)
        h_tilde = jnp.tanh(xh + (h * z) @ params.h.u)
        a = at * r
        return (1.0 - a) * h + a * h_tilde, None

    b, t, hdim = states.shape
    h0 = jnp.zeros((b, hdim), states.dtype)
    h_fin, _ = jax.lax.scan(
        step, h0,
        tuple(jnp.swapaxes(v, 0, 1)
              for v in (xr_all, xz_all, xh_all, attention)),
        unroll=min(t, 8),
    )
    return h_fin


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    variants = {"folded": augru_folded, "pergate": augru_pergate}
    runs = {}
    for name, fn in variants.items():
        dien_mod.augru = fn
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
