"""Per-model training throughput on the device-resident epoch schedule.

bench.py records the headline (DeepFM); this sweeps the whole zoo at the
same protocol (batch 65536, synthetic epoch generated ON DEVICE,
forced-sync best-of-3 steady epochs) so BASELINE.md can carry a
throughput row per reference model. DIEN gets its negative-history
columns (`negativeUserRatedMovie2..5`, random ids like
`data/negatives.py`) and the two-headed aux loss.

    python tools/zoo_bench.py [model ...]
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
from sparrowrecsys_tpu.models import MODEL_REGISTRY, build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync

BATCH = 65536
STEPS = 16


def gen_epoch_fn(n: int, dien: bool):
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        f = {
            "movieId": jax.random.randint(ks[0], (n,), 1, 1001, dtype=jnp.int32),
            "userId": jax.random.randint(ks[1], (n,), 1, 30001, dtype=jnp.int32),
        }
        hist = [f"userRatedMovie{i}" for i in range(1, 6)]
        if dien:
            hist += [f"negativeUserRatedMovie{i}" for i in range(2, 6)]
        hk = jax.random.split(ks[2], len(hist) + 8)
        for i, c in enumerate(hist):
            f[c] = jax.random.randint(hk[i], (n,), 0, 1001, dtype=jnp.int32)
        for i, c in enumerate(
            ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
             "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3")
        ):
            f[c] = jax.random.randint(
                hk[len(hist) + i], (n,), -1, 19, dtype=jnp.int32
            )
        nk = jax.random.split(ks[3], 8)
        for i, c in enumerate(
            ("releaseYear", "movieRatingCount", "movieAvgRating",
             "movieRatingStddev", "userRatingCount", "userAvgRating",
             "userRatingStddev")
        ):
            f[c] = jax.random.normal(nk[i], (n,), jnp.float32)
        labels = (jax.random.uniform(nk[7], (n,)) > 0.5).astype(jnp.float32)
        return f, labels

    return gen


def bench_model(name: str) -> float:
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=(name == "dien"))(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    loss_fn = dien_loss_fn() if name == "dien" else None
    trainer = Trainer(
        build_model(name), TrainConfig(batch_size=BATCH, epochs=1),
        loss_fn=loss_fn,
    )
    trainer._build_steps()
    params = trainer.init_params(sample_host)
    carry = (params, trainer.tx.init(params), M.init_metrics())
    carry = trainer._train_epoch(
        *carry, data, labels_d, jax.random.PRNGKey(0),
        n=n, batch_size=BATCH, shuffle=True,
    )
    hard_sync(carry[0])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        carry = trainer._train_epoch(
            *carry, data, labels_d, jax.random.PRNGKey(i + 1),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        best = min(best, time.perf_counter() - t0)
    eps = n / best
    print(
        f"{name:<20} {best/STEPS*1e3:7.3f} ms/step  {eps/1e6:7.2f}M ex/s",
        flush=True,
    )
    return eps


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    names = sys.argv[1:] or sorted(MODEL_REGISTRY)
    for name in names:
        bench_model(name)


if __name__ == "__main__":
    main()
