"""Bisect the t=64 epoch-compile HBM OOM (2026-08-19).

deepfm's device-resident epoch at a 2.3M-row dataset with 64 history
columns failed TPU AOT compile at 71.54G HBM planned (15.75G available),
while the same program shape lowers to 1.45 GB temp on CPU — a
TPU-layout-specific blow-up. This probe compiles (never executes) the
epoch across a (t, n) grid and prints the compiler's memory analysis, so
the scaling dimension is measured, not guessed.

    python tools/t64_oom_probe.py [t:n ...]   (default grid)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer

B = 8192


def probe(t: int, n: int) -> None:
    feats = {"movieId": jax.ShapeDtypeStruct((n,), jnp.int32),
             "userId": jax.ShapeDtypeStruct((n,), jnp.int32)}
    for k in range(1, t + 1):
        feats[f"userRatedMovie{k}"] = jax.ShapeDtypeStruct((n,), jnp.int32)
    for c in ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
              "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3"):
        feats[c] = jax.ShapeDtypeStruct((n,), jnp.int32)
    for c in ("releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev", "userRatingCount", "userAvgRating",
              "userRatingStddev"):
        feats[c] = jax.ShapeDtypeStruct((n,), jnp.float32)
    labels = jax.ShapeDtypeStruct((n,), jnp.float32)

    tr = Trainer(build_model("deepfm"), TrainConfig(batch_size=B, epochs=1))
    tr._build_steps()
    sample = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in feats.items()
    }
    params = tr.init_params(sample)
    opt = tr.tx.init(params)
    low = tr._train_epoch.lower(
        params, opt, M.init_metrics(), feats, labels,
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        n=n, batch_size=B, shuffle=True,
    )
    try:
        ma = low.compile().memory_analysis()
        print(f"t={t:<3} n={n:<9} temp={ma.temp_size_in_bytes/2**30:8.2f}G "
              f"args={ma.argument_size_in_bytes/2**30:6.2f}G", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160]
        print(f"t={t:<3} n={n:<9} COMPILE FAIL: {msg}", flush=True)


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    grid = [(5, 2_300_000), (64, 300_000), (32, 2_300_000), (64, 1_000_000),
            (64, 2_300_000)]
    if len(sys.argv) > 1:
        grid = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    for t, n in grid:
        probe(t, n)


if __name__ == "__main__":
    main()
