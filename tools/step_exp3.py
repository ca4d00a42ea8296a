"""Experiment 3: per-step random gathers vs pre-gathered contiguous
batches, and a profile dump fallback.

The scan body does 28 x jnp.take(data[col], idx) with random idx per
step — 229k random small-row gathers/step. Pre-gathering the shuffled
epoch ONCE (one big permutation gather) lets the scan read contiguous
[steps, batch] slices instead.

    python tools/step_exp3.py
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

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import hard_sync

BATCH = 8192
STEPS = 64


def main():
    print("backend:", jax.devices()[0].platform)
    model = build_model("deepfm")
    n = BATCH * STEPS
    feats = _example_features(n)
    labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels_d = jnp.asarray(ds.labels)
    feats2 = {k: jnp.asarray(v[:2]) for k, v in ds.features.items()}
    params0 = model.init(jax.random.PRNGKey(0), feats2)["params"]
    tx = optax.adam(1e-3)

    def loss_of(p, f, y):
        logits = model.apply({"params": p}, f)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

    def run(epoch, tag):
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
        print(f"{tag:<22} {best/STEPS*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s")

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_pergather(params, opt_state, key):
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

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_pregather(params, opt_state, key):
        order = jax.random.permutation(key, n).astype(jnp.int32)
        fb = {
            k: jnp.take(v, order, axis=0).reshape((STEPS, BATCH) + v.shape[1:])
            for k, v in data.items()
        }
        yb = jnp.take(labels_d, order, axis=0).reshape(STEPS, BATCH)

        def body(carry, x):
            p, o = carry
            f, y = x
            grads = jax.grad(loss_of)(p, f, y)
            u, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, u)
            return (p, o), None

        carry, _ = jax.lax.scan(body, (params, opt_state), (fb, yb))
        return carry

    run(epoch_pergather, "per-step gathers")
    run(epoch_pregather, "pre-gathered batches")

    # no-shuffle contiguous reshape (zero gathers at all)
    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_noshuffle(params, opt_state, key):
        fb = {
            k: v.reshape((STEPS, BATCH) + v.shape[1:]) for k, v in data.items()
        }
        yb = labels_d.reshape(STEPS, BATCH)

        def body(carry, x):
            p, o = carry
            f, y = x
            grads = jax.grad(loss_of)(p, f, y)
            u, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, u)
            return (p, o), None

        carry, _ = jax.lax.scan(body, (params, opt_state), (fb, yb))
        return carry

    run(epoch_noshuffle, "no-shuffle contiguous")


if __name__ == "__main__":
    main()
