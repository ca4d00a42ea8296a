"""Experiment 5: group-flattened Adam — ravel the many SMALL param
tensors into one vector (one set of elementwise Adam ops) while keeping
large tables per-leaf (their ravel copy is what made the full-flat
variant lose in exp2).

DeepFM has ~20 param tensors; Adam is ~6-8 elementwise ops per tensor
per step, all micro-sized. exp2 showed full-flatten loses (the 30001-row
table pays a gather/concat); this splits by size.

    python tools/step_exp5.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import hard_sync

BATCH = 8192
STEPS = 64
SMALL = 65536  # numel threshold: below this, tensors ride the fused vector


def grouped_adam(params0, lr=1e-3, b1=0.9, b2=0.999, eps=1e-8):
    leaves, treedef = jax.tree_util.tree_flatten(params0)
    sizes = [int(np.prod(l.shape)) for l in leaves]
    small_idx = [i for i, s in enumerate(sizes) if s < SMALL]
    big_idx = [i for i, s in enumerate(sizes) if s >= SMALL]
    shapes = [leaves[i].shape for i in small_idx]
    splits = np.cumsum([int(np.prod(s)) for s in shapes])[:-1].tolist()

    def to_groups(tree):
        ls = jax.tree_util.tree_leaves(tree)
        vec = (
            jnp.concatenate([ls[i].reshape(-1) for i in small_idx])
            if small_idx else jnp.zeros((0,))
        )
        bigs = [ls[i] for i in big_idx]
        return vec, bigs

    def from_groups(vec, bigs):
        ls = [None] * len(leaves)
        if small_idx:
            parts = jnp.split(vec, splits)
            for j, i in enumerate(small_idx):
                ls[i] = parts[j].reshape(shapes[j])
        for j, i in enumerate(big_idx):
            ls[i] = bigs[j]
        return jax.tree_util.tree_unflatten(treedef, ls)

    def init(params):
        vec, bigs = to_groups(params)
        z = lambda x: jnp.zeros_like(x)
        return {
            "mv": z(vec), "vv": z(vec),
            "mb": [z(b) for b in bigs], "vb": [z(b) for b in bigs],
            "t": jnp.zeros((), jnp.int32),
        }

    def update(grads, st, params):
        gv, gb = to_groups(grads)
        t = st["t"] + 1
        tf = t.astype(jnp.float32)
        c1 = 1 - b1 ** tf
        c2 = 1 - b2 ** tf

        def upd(m, v, g):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            return m, v, -lr * (m / c1) / (jnp.sqrt(v / c2) + eps)

        mv, vv, dv = upd(st["mv"], st["vv"], gv)
        outb, mb, vb = [], [], []
        for m, v, g in zip(st["mb"], st["vb"], gb):
            m2, v2, d = upd(m, v, g)
            mb.append(m2)
            vb.append(v2)
            outb.append(d)
        delta = from_groups(dv, outb)
        return delta, {"mv": mv, "vv": vv, "mb": mb, "vb": vb, "t": t}

    return init, update


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

    int_cols = sorted(k for k, v in data.items() if v.dtype.kind == "i")
    flt_cols = sorted(k for k, v in data.items() if v.dtype.kind == "f")
    int_mat = jnp.stack([data[k] for k in int_cols], 1)
    flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels_d], 1)

    def loss_of(p, f, y):
        logits = model.apply({"params": p}, f)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

    def run(tag, opt_init, do_update):
        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch(params, opt_state, key):
            order = jax.random.permutation(key, n).astype(jnp.int32)
            idx_all = order.reshape(STEPS, BATCH)

            def body(carry, idx):
                p, o = carry
                ir = jnp.take(int_mat, idx, axis=0)
                fr = jnp.take(flt_mat, idx, axis=0)
                f = {k: ir[:, j] for j, k in enumerate(int_cols)}
                f.update({k: fr[:, j] for j, k in enumerate(flt_cols)})
                y = fr[:, -1]
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
        for i in range(4):
            p, o = carry
            t0 = time.perf_counter()
            carry = epoch(p, o, jax.random.PRNGKey(i + 1))
            hard_sync(carry[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{tag:<16} {best/STEPS*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s")

    tx = optax.adam(1e-3)

    def upd_tree(grads, o, p):
        u, o = tx.update(grads, o, p)
        return optax.apply_updates(p, u), o

    run("adam_tree", tx.init, upd_tree)

    ginit, gupdate = grouped_adam(params0)

    def upd_group(grads, o, p):
        d, o = gupdate(grads, o, p)
        return jax.tree.map(lambda a, b: a + b, p, d), o

    run("adam_grouped", ginit, upd_group)


if __name__ == "__main__":
    main()
