"""Round-3 DIEN backward attribution: where do the ~5 ms of backward go?

The r2 decomposition (tools/dien_decomp.py) showed DIEN ~55% forward /
~45% backward and named the scanned GRU/AUGRU recurrences as the suspect.
The hand-written recurrence VJP (ops/augru.py, weight grads as one stacked
matmul) measured a WASH (tools/dien_vjp_exp.py: 0.967x) — so this tool
attributes the full step cost by STRUCTURAL ablation instead, all variants
trained with the identical pre-permuted packed scan epoch, interleaved in
one process, forced sync, best-of-N:

  full          : reference DIEN (aux heads + GRU + AUGRU), custom VJP on
  fallback      : same, custom VJP off (lax.scan autodiff)
  noaux         : aux_mode="none" — aux heads structurally removed
                  (ADVICE r2 #1: alpha=0 does NOT DCE them)
  norec         : aux heads kept; GRU -> identity, AUGRU -> attention-
                  weighted mean (recurrences replaced by shape-preserving
                  stand-ins; bounds the recurrences' full fwd+bwd cost)
  norec_noaux   : both removed — everything-else floor

    python tools/dien_decomp2.py        # on the TPU
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
from sparrowrecsys_tpu.models import dien as dien_mod
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn

REAL_GRU, REAL_AUGRU = dien_mod.gru, dien_mod.augru


def _identity_gru(params, x, mask=None, custom_vjp=True):
    del params, mask, custom_vjp
    return x


def _mean_augru(params, states, attention, custom_vjp=True):
    del params, custom_vjp
    return jnp.mean(states * attention, axis=1)


def make(aux_none: bool, norec: bool, custom: bool):
    dien_mod.gru = _identity_gru if norec else REAL_GRU
    dien_mod.augru = _mean_augru if norec else REAL_AUGRU
    aux_mode = "none" if aux_none else "reference"
    trainer = Trainer(
        build_model(
            "dien", aux_mode=aux_mode, recurrence_custom_vjp=custom
        ),
        TrainConfig(batch_size=BATCH, epochs=1),
        loss_fn=dien_loss_fn(aux_mode=aux_mode),
    )
    trainer._build_steps()
    return trainer


VARIANTS = {
    "full": dict(aux_none=False, norec=False, custom=True),
    "fallback": dict(aux_none=False, norec=False, custom=False),
    "noaux": dict(aux_none=True, norec=False, custom=True),
    "norec": dict(aux_none=False, norec=True, custom=True),
    "norec_noaux": dict(aux_none=True, norec=True, custom=True),
}


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    runs = {}
    for name, kw in VARIANTS.items():
        tr = make(**kw)
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        runs[name] = (tr, carry)
    dien_mod.gru, dien_mod.augru = REAL_GRU, REAL_AUGRU
    best = {name: float("inf") for name in VARIANTS}
    for i in range(3):
        for name in VARIANTS:
            tr, carry = runs[name]
            t0 = time.perf_counter()
            carry = tr._train_epoch(
                *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            best[name] = min(best[name], time.perf_counter() - t0)
            runs[name] = (tr, carry)
    for name in VARIANTS:
        b = best[name]
        print(
            f"{name:<12} {b/STEPS*1e3:7.3f} ms/step {n/b/1e6:7.2f}M ex/s",
            flush=True,
        )
    print(
        f"aux cost (full-noaux):  {(best['full']-best['noaux'])/STEPS*1e3:6.3f} ms/step\n"
        f"rec cost (full-norec):  {(best['full']-best['norec'])/STEPS*1e3:6.3f} ms/step\n"
        f"floor (norec_noaux):    {best['norec_noaux']/STEPS*1e3:6.3f} ms/step",
        flush=True,
    )


if __name__ == "__main__":
    main()
