"""Experiment 2: batch scaling + flat-fused Adam for the DeepFM step.

The ablation (tools/step_ablation.py) showed the fwd->full-step delta is
NOT the embedding scatter (0.05 ms) but distributed per-op overhead in
backward+Adam. Levers: (a) larger batch amortizes fixed per-op cost,
(b) flattening all param leaves into ONE vector turns Adam's ~8 ops x 20
leaves into ~8 ops total.

    python tools/step_exp2.py
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


def flat_adam(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    """Adam over a single flattened param vector: one set of elementwise
    ops regardless of how many param tensors the model has."""

    def init(params):
        flat, unravel = jax.flatten_util.ravel_pytree(params)
        return {
            "m": jnp.zeros_like(flat),
            "v": jnp.zeros_like(flat),
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params):
        gflat, unravel = jax.flatten_util.ravel_pytree(grads)
        t = state["t"] + 1
        m = b1 * state["m"] + (1 - b1) * gflat
        v = b2 * state["v"] + (1 - b2) * gflat * gflat
        mhat = m / (1 - b1 ** t.astype(jnp.float32))
        vhat = v / (1 - b2 ** t.astype(jnp.float32))
        upd = -lr * mhat / (jnp.sqrt(vhat) + eps)
        return unravel(upd), {"m": m, "v": v, "t": t}

    return init, update


def main():
    import jax.flatten_util  # noqa: F401

    print("backend:", jax.devices()[0].platform)
    model = build_model("deepfm")

    cfgs = [(8192, 64), (32768, 32)]
    if "--big" in sys.argv:
        cfgs = [(131072, 16)]
    for batch, steps in cfgs:
        n = batch * steps
        feats = _example_features(n)
        labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
        ds = EncodedDataset(feats, labels)
        data = {k: jnp.asarray(v) for k, v in ds.features.items()}
        labels_d = jnp.asarray(ds.labels)
        feats2 = {k: jnp.asarray(v[:2]) for k, v in ds.features.items()}
        params0 = model.init(jax.random.PRNGKey(0), feats2)["params"]

        def loss_of(p, f, y):
            logits = model.apply({"params": p}, f)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

        for opt_name in ("adam_tree", "adam_flat"):
            if opt_name == "adam_tree":
                tx = optax.adam(1e-3)
                opt_init = tx.init

                def do_update(grads, o, p):
                    u, o = tx.update(grads, o, p)
                    return optax.apply_updates(p, u), o

            else:
                finit, fupdate = flat_adam(1e-3)
                opt_init = finit

                def do_update(grads, o, p):
                    u, o = fupdate(grads, o, p)
                    return jax.tree.map(lambda a, b: a + b, p, u), o

            @partial(jax.jit, donate_argnums=(0, 1))
            def epoch(params, opt_state, key, do_update=do_update):
                order = jax.random.permutation(key, n).astype(jnp.int32)
                idx_all = order.reshape(steps, batch)

                def body(carry, idx):
                    p, o = carry
                    f = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
                    y = jnp.take(labels_d, idx, axis=0)
                    grads = jax.grad(loss_of)(p, f, y)
                    p, o = do_update(grads, o, p)
                    return (p, o), None

                carry, _ = jax.lax.scan(body, (params, opt_state), idx_all)
                return carry

            params = jax.tree.map(jnp.copy, params0)
            opt = opt_init(params)
            carry = epoch(params, opt, jax.random.PRNGKey(0))
            hard_sync(carry[0])
            best = float("inf")
            for i in range(3):
                p, o = carry
                t0 = time.perf_counter()
                carry = epoch(p, o, jax.random.PRNGKey(i + 1))
                hard_sync(carry[0])
                best = min(best, time.perf_counter() - t0)
            eps_ = n / best
            print(
                f"batch={batch:<7} {opt_name:<10} {best/steps*1e3:7.3f} ms/step"
                f"  {eps_/1e6:7.2f}M ex/s"
            )


if __name__ == "__main__":
    main()
