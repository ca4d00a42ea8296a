"""Component surgery on the DeepFM train step: add components one at a
time and time grad+adam for each, to find what makes backward cost ~3x
forward per element.

    python tools/step_surgery.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models.features import (
    GenreEmbed, IdBias, IdEmbed, numeric_stack,
)
from sparrowrecsys_tpu.training.loop import hard_sync

BATCH = 8192
STEPS = 64


class Surgery(nn.Module):
    level: int  # 0 numerics-MLP, 1 +id embs, 2 +genre embs, 3 +biases, 4 +dots

    @nn.compact
    def __call__(self, f):
        parts = [numeric_stack(f)]
        extra = 0.0
        if self.level >= 1:
            item = IdEmbed(1001, 10, name="emb_movieId")(f["movieId"])
            user = IdEmbed(30001, 10, name="emb_userId")(f["userId"])
            parts += [item, user]
        if self.level >= 2:
            ig = GenreEmbed(dim=10, name="emb_movieGenre1")(f["movieGenre1"])
            ug = GenreEmbed(dim=10, name="emb_userGenre1")(f["userGenre1"])
            parts += [ig, ug]
        if self.level >= 3:
            extra = (
                IdBias(1001, name="bias_movieId")(f["movieId"])
                + IdBias(30001, name="bias_userId")(f["userId"])
                + IdBias(19, name="bias_userGenre1")(f["userGenre1"])
                + IdBias(19, name="bias_movieGenre1")(f["movieGenre1"])
            )
        if self.level >= 4:
            dots = jnp.stack(
                [jnp.sum(item * user, -1), jnp.sum(ig * ug, -1),
                 jnp.sum(ig * user, -1), jnp.sum(item * ug, -1)], -1)
            parts.append(dots)
        x = jnp.concatenate(parts, axis=-1)
        x = nn.relu(nn.Dense(64, name="d1")(x))
        x = nn.relu(nn.Dense(64, name="d2")(x))
        return nn.Dense(1, name="out")(x)[..., 0] + extra


def main():
    print("backend:", jax.devices()[0].platform)
    n = BATCH * STEPS
    feats = _example_features(n)
    labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels_d = jnp.asarray(ds.labels)
    feats2 = {k: jnp.asarray(v[:2]) for k, v in ds.features.items()}

    for level in range(5):
        model = Surgery(level)
        params0 = model.init(jax.random.PRNGKey(0), feats2)["params"]
        tx = optax.adam(1e-3)

        def loss_of(p, f, y, model=model):
            logits = model.apply({"params": p}, f)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch(params, opt_state, key, loss_of=loss_of, tx=tx):
            order = jax.random.permutation(key, n).astype(jnp.int32)
            idx_all = order.reshape(STEPS, BATCH)

            def body(carry, idx):
                p, o = carry
                f = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
                y = jnp.take(labels_d, idx, axis=0)
                grads = jax.grad(loss_of)(p, f, y)
                u, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, u)
                return (p, o), None

            carry, _ = jax.lax.scan(body, (params, opt_state), idx_all)
            return carry

        params = jax.tree.map(jnp.copy, params0)
        opt = tx.init(params)
        carry = epoch(params, opt, jax.random.PRNGKey(0))
        hard_sync(carry[0])
        best = float("inf")
        for i in range(4):
            p, o = carry
            t0 = time.perf_counter()
            carry = epoch(p, o, jax.random.PRNGKey(i + 1))
            hard_sync(carry[0])
            best = min(best, time.perf_counter() - t0)
        print(
            f"level={level}  {best/STEPS*1e3:7.3f} ms/step"
            f"  {n/best/1e6:7.2f}M ex/s"
        )


if __name__ == "__main__":
    main()
