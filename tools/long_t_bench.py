"""DIN training throughput at production history lengths (T=64/256),
XLA vs Pallas attention inside the FULL train step.

KERNELS.md's standalone-forward table has Pallas winning din_attention
only at T=256 (2728 vs 2775 us), and the DeepFMv2 experience showed a
standalone-forward win can be a full-step regression (custom-VJP pair
schedules worse than XLA fusing the whole step). This measures the
full-step A/B at the shapes where the question is open, so the
`use_pallas` guidance for long-history production configs is grounded
in end-to-end numbers, not kernel microbenches.

    python tools/long_t_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync

STEPS = 8


def bench(t_hist: int, batch: int, use_pallas) -> float:
    n = batch * STEPS
    feats = _example_features(n)
    rng = np.random.default_rng(1)
    for k in range(5, t_hist):
        feats[f"userRatedMovie{k + 1}"] = rng.integers(
            0, 1001, n
        ).astype(np.int32)
    labels = (rng.random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    model = build_model(
        "din", recent_movies=t_hist, use_pallas=use_pallas
    )
    trainer = Trainer(model, TrainConfig(batch_size=batch, epochs=1))
    res = trainer.fit(ds, verbose=False)
    # steady epochs, forced sync (fit reports steady-state already but we
    # re-time explicitly to keep one protocol across tools)
    params = res.params
    opt_state = trainer.tx.init(params)
    import jax.numpy as jnp

    from sparrowrecsys_tpu.ops import metrics as M

    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    lab = jnp.asarray(ds.labels)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        params, opt_state, _ = trainer._train_epoch(
            params, opt_state, M.init_metrics(), data, lab,
            jax.random.PRNGKey(i), n=n, batch_size=batch, shuffle=True,
        )
        hard_sync(params)
        best = min(best, time.perf_counter() - t0)
    return n / best


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    for t_hist, batch in ((64, 8192), (256, 4096)):
        for up in (False, True):
            ex_s = bench(t_hist, batch, up)
            print(
                f"T={t_hist:<4} batch={batch:<6} "
                f"{'pallas' if up else 'xla   '} {ex_s/1e6:7.3f}M ex/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
