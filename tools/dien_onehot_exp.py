"""A/B: one-hot-matmul vs scatter-add embedding backward for DIEN.

dien_decomp2 localized DIEN's cost: recurrences 0.66 ms/step, aux block
2.1 ms/step, 7.3 ms floor. The movie-table gathers are [B, T]-shaped
(history + negatives + candidate), so the landed one-hot backward
(ONEHOT_GRAD_MAX_VOCAB=2048, measured on DeepFM's [B] gathers) builds
[B*T, 1001] one-hots — ~1.3 GB of materialized HBM traffic per backward
at batch 65536 IF XLA doesn't fuse the one-hot into the dot. This tool
settles whether the scatter-add path wins at DIEN's gather shapes:
both variants compiled with the respective dispatch constant, then
interleaved, forced sync, best-of-N.

    python tools/dien_onehot_exp.py
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
from sparrowrecsys_tpu.ops import embedding as emb_mod
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    default_max = emb_mod.ONEHOT_GRAD_MAX_VOCAB
    runs = {}
    for name, maxv in (("onehot", default_max), ("scatter", 0)):
        emb_mod.ONEHOT_GRAD_MAX_VOCAB = maxv  # read at trace time
        tr = Trainer(
            build_model("dien"),
            TrainConfig(batch_size=BATCH, epochs=1),
            loss_fn=dien_loss_fn(),
        )
        tr._build_steps()
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])  # compiled with this dispatch baked in
        runs[name] = (tr, carry)
    emb_mod.ONEHOT_GRAD_MAX_VOCAB = default_max
    best = {name: float("inf") for name in runs}
    for i in range(4):
        for name in runs:
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
    print(f"scatter/onehot speedup: {best['onehot']/best['scatter']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
