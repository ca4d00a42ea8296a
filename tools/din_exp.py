"""A/B: DIN activation-unit matmul structure inside the full train step.

The r1 "algebraic expansion" replaced the reference's single
concat([h-c, h, c, h*c]) @ w1 matmul with THREE small matmuls to avoid
materializing [B, T, 4D]. On TPU every matmul pads K and N to 128 lanes,
so at D=10 the three K=10 matmuls each waste ~12x of the MXU — the one
K=30/K=40 concat matmul may be faster even with the materialized
prologue. Variants (bit-equal math up to f32 reassociation):

  expand3   current production: h@(wa+wb) + c@(wc-wa) + (h*c)@wd
  concat3   [h, c, h*c] @ [(wa+wb); (wc-wa); wd]  (one K=3D matmul)
  concat4   [h-c, h, c, h*c] @ w1                 (reference layout, K=4D)

    python tools/din_exp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import sparrowrecsys_tpu.models.din as din_mod
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.ops.attention import din_attention_xla
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def _epilogue(a, b1, alpha, w2, b2, h):
    a = a + b1
    a = jnp.where(a >= 0, a, alpha * a)
    w = jax.nn.sigmoid(jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2)
    mask = jnp.any(h != 0, axis=-1, keepdims=True)
    return jnp.sum(w * mask * h, axis=-2)


def att_concat3(hist, cand, w1, b1, alpha, w2, b2, use_pallas=None):
    d = hist.shape[-1]
    wa, wb, wc, wd = w1[:d], w1[d : 2 * d], w1[2 * d : 3 * d], w1[3 * d :]
    ce = jnp.broadcast_to(cand[..., None, :], hist.shape)
    feats = jnp.concatenate([hist, ce, hist * ce], axis=-1)
    wk = jnp.concatenate([wa + wb, wc - wa, wd], axis=0)
    a = jnp.dot(feats, wk, preferred_element_type=jnp.float32)
    return _epilogue(a, b1, alpha, w2, b2, hist)


def att_concat4(hist, cand, w1, b1, alpha, w2, b2, use_pallas=None):
    ce = jnp.broadcast_to(cand[..., None, :], hist.shape)
    feats = jnp.concatenate([hist - ce, hist, ce, hist * ce], axis=-1)
    a = jnp.dot(feats, w1, preferred_element_type=jnp.float32)
    return _epilogue(a, b1, alpha, w2, b2, hist)


VARIANTS = {
    "expand3": din_attention_xla,
    "concat3": att_concat3,
    "concat4": att_concat4,
}


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=False)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    runs = {}
    for name, fn in VARIANTS.items():
        din_mod.din_attention = lambda h, c, w1, b1, al, w2, b2, use_pallas=None, _f=fn: _f(
            h, c, w1, b1, al, w2, b2
        )
        tr = Trainer(
            build_model("din"), TrainConfig(batch_size=BATCH, epochs=1)
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
    for name, b in best.items():
        print(
            f"{name:<8} {b/STEPS*1e3:7.3f} ms/step {n/b/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
