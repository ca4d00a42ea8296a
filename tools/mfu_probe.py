"""Forward-path attribution at the MFU config (round-4 follow-up).

mfu_demo measured fwd-only 36.1 ms/step at dim=128 hidden=1024 batch=262144
where the dense matmuls alone bound at ~6.3 ms (197 TFLOP/s peak) — this
probe names the gap. step_exp10's zero-the-lookups trick at production
shape: interleaved fwd-only epoch variants, each structurally removing one
component (XLA DCEs what the output doesn't consume), forced sync,
best-of-3.

  full      : the measured fwd path
  nogenre   : 8 genre lookups -> zeros
  noid      : movieId/userId lookups (2^20/2^17-row tables) -> zeros
  nolookup  : every embedding -> zeros (concat + towers remain)
  nomlp     : towers removed; output = sum(x) (lookup/concat side alone)
  noshuffle : full, epoch permute skipped (shuffle=False)

    python tools/mfu_probe.py [--batch 262144] [--dim 128] [--hidden 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.models.features import (
    GENRE_COLS,
    GenreEmbed,
    IdEmbed,
    compute_dtype,
    numeric_stack,
)
from sparrowrecsys_tpu.training.loop import hard_sync
from tools.mfu_demo import STEPS, gen_epoch

USER_VOCAB = 1 << 20
MOVIE_VOCAB = 1 << 17


class ProbeMLP(nn.Module):
    dim: int
    hidden: int
    mode: str = "full"

    @nn.compact
    def __call__(self, features):
        b = features["movieId"].shape[0]
        zeros = jnp.zeros((b, self.dim), jnp.float32)
        parts = [numeric_stack(features)]
        for col in GENRE_COLS:
            if self.mode in ("nogenre", "nolookup"):
                parts.append(zeros)
            else:
                parts.append(
                    GenreEmbed(dim=self.dim, name=f"emb_{col}")(features[col])
                )
        if self.mode in ("noid", "nolookup"):
            parts += [zeros, zeros]
        else:
            parts.append(
                IdEmbed(MOVIE_VOCAB, self.dim, name="emb_movieId")(
                    features["movieId"]
                )
            )
            parts.append(
                IdEmbed(USER_VOCAB, self.dim, name="emb_userId")(
                    features["userId"]
                )
            )
        x = jnp.concatenate(parts, axis=-1)
        if self.mode == "nomlp":
            return jnp.sum(x, axis=-1)
        dt = compute_dtype("bfloat16")
        x = nn.relu(nn.Dense(self.hidden, dtype=dt, name="dense1")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=dt, name="dense2")(x))
        return nn.Dense(1, name="out")(x.astype(jnp.float32))[..., 0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=1024)
    args = ap.parse_args()
    batch = args.batch
    n = batch * STEPS
    print("backend:", jax.devices()[0].platform, flush=True)
    data, labels = gen_epoch(n, USER_VOCAB, MOVIE_VOCAB)(jax.random.PRNGKey(0))
    int_cols = sorted(k for k, v in data.items() if v.dtype == jnp.int32)
    flt_cols = sorted(k for k, v in data.items() if v.dtype != jnp.int32)
    int_mat = jnp.stack([data[k] for k in int_cols], axis=1)
    flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels], axis=1)
    steps = n // batch

    def make(mode):
        model = ProbeMLP(args.dim, args.hidden, mode=mode)
        shuffle = mode != "noshuffle"

        @jax.jit
        def fwd_epoch(params, imat, fmat, key):
            if shuffle:
                perm = jax.random.permutation(key, n)
                imat, fmat = imat[perm], fmat[perm]
            xi = imat.reshape(steps, batch, -1)
            xf = fmat.reshape(steps, batch, -1)

            def body(acc, x):
                feats = {k: x["i"][:, j] for j, k in enumerate(int_cols)}
                for j, k in enumerate(flt_cols):
                    feats[k] = x["f"][:, j]
                out = model.apply({"params": params}, feats)
                labels_b = x["f"][:, -1]
                return acc + jnp.sum((out - labels_b) ** 2), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), {"i": xi, "f": xf})
            return acc

        sample = {
            k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
            for k, v in data.items()
        }
        params = model.init(jax.random.PRNGKey(0), sample)["params"]
        return fwd_epoch, params

    modes = ("full", "noshuffle", "nogenre", "noid", "nolookup", "nomlp")
    runs = {}
    for mode in modes:
        fn, params = make(mode)
        s = fn(params, int_mat, flt_mat, jax.random.PRNGKey(0))
        np.asarray(s)
        runs[mode] = (fn, params)
        print(f"{mode}: compiled", flush=True)

    best = {m: float("inf") for m in modes}
    for r in range(3):
        for mode in modes:
            fn, params = runs[mode]
            t0 = time.perf_counter()
            s = fn(params, int_mat, flt_mat, jax.random.PRNGKey(r + 1))
            np.asarray(s)
            best[mode] = min(best[mode], time.perf_counter() - t0)
    base = best["full"]
    for mode in modes:
        d = (base - best[mode]) * 1e3 / steps
        print(f"{mode:<10} {best[mode]/steps*1e3:8.2f} ms/step  "
              f"(component ~{d:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
