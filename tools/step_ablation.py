"""Ablate the DeepFM production train step on real TPU: where does the
fwd(0.45ms) -> full-step(1.57ms) delta actually go?

Variants (all one scan-per-epoch dispatch, forced-sync best-of-3):
  full            the production epoch (grad + adam + metrics + gathers)
  no_metrics      skip update_metrics
  sg_user         stop_gradient on the userId embedding output (drop the
                  30001-row scatter from backward)
  sg_all_emb      stop_gradient on every embedding lookup
  sgd             plain SGD instead of Adam
  fwd_only        forward + loss only (no grad/update)

    python tools/step_ablation.py
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
from sparrowrecsys_tpu.ops import metrics as M
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
    tx_adam = optax.adam(1e-3)
    tx_sgd = optax.sgd(1e-3)

    def make_apply(sg):
        if sg is None:
            return lambda p, f: model.apply({"params": p}, f)

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            name = getattr(context.module, "name", "") or ""
            if sg == "all" and name.startswith(("emb_", "bias_")):
                return jax.lax.stop_gradient(out)
            if sg == "user" and name == "emb_userId":
                return jax.lax.stop_gradient(out)
            return out

        return lambda p, f: nn_apply_with_interceptor(p, f, interceptor)

    import flax.linen as nn

    def nn_apply_with_interceptor(p, f, interceptor):
        with nn.intercept_methods(interceptor):
            return model.apply({"params": p}, f)

    def build_epoch(sg=None, use_metrics=True, tx=tx_adam, fwd_only=False):
        apply_fn = make_apply(sg)

        def loss_of(p, f, y, m):
            logits = apply_fn(p, f)
            bce = optax.sigmoid_binary_cross_entropy(logits, y)
            loss = jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0)
            return loss, (logits, jnp.sum(bce * m))

        @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=())
        def epoch(params, opt_state, mstate, key):
            order = jax.random.permutation(key, n).astype(jnp.int32)
            idx_all = order.reshape(STEPS, BATCH)
            mask = jnp.ones((BATCH,), jnp.float32)

            def body(carry, idx):
                p, o, ms = carry
                f = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
                y = jnp.take(labels_d, idx, axis=0)
                if fwd_only:
                    loss, (logits, ls) = loss_of(p, f, y, mask)
                    ms = ms + loss if use_metrics else ms
                    return (p, o, ms), None
                (loss, (logits, ls)), grads = jax.value_and_grad(
                    loss_of, has_aux=True
                )(p, f, y, mask)
                updates, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                if use_metrics:
                    probs = jax.nn.sigmoid(logits)
                    ms = M.update_metrics(ms, probs, y, ls, mask)
                return (p, o, ms), None

            carry, _ = jax.lax.scan(body, (params, opt_state, mstate), idx_all)
            return carry

        return epoch

    variants = [
        ("full", dict()),
        ("no_metrics", dict(use_metrics=False)),
        ("sg_user", dict(sg="user")),
        ("sg_all_emb", dict(sg="all")),
        ("sgd", dict(tx=tx_sgd)),
        ("fwd_only", dict(fwd_only=True, use_metrics=False)),
    ]
    for name, kw in variants:
        tx = kw.get("tx", tx_adam)
        epoch = build_epoch(**kw)
        params = jax.tree.map(jnp.copy, params0)
        opt = tx.init(params)
        ms = (
            jnp.zeros(()) if kw.get("fwd_only") and not kw.get("use_metrics", True)
            else (jnp.zeros(()) if kw.get("fwd_only") else M.init_metrics())
        )
        if kw.get("fwd_only"):
            ms = jnp.zeros(())
        carry = epoch(params, opt, ms, jax.random.PRNGKey(0))  # compile
        hard_sync(carry[0])
        best = float("inf")
        for i in range(3):
            p, o, m = carry
            t0 = time.perf_counter()
            carry = epoch(p, o, m, jax.random.PRNGKey(i + 1))
            hard_sync(carry[0])
            best = min(best, time.perf_counter() - t0)
        ms_step = best / STEPS * 1e3
        eps = BATCH * STEPS / best
        print(f"{name:<12} {ms_step:7.3f} ms/step  {eps/1e6:7.2f}M ex/s")


if __name__ == "__main__":
    main()
