"""Experiment: SGNS update via one-hot matmuls vs scatter-adds.

BASELINE.md: the SGNS epoch (~2.2M pairs/s) is bound by per-step
negative sampling + the three vocab-table scatter-adds. The item vocab
(1001) is far below ONEHOT_GRAD_MAX_VOCAB=2048, where the training loop's
measured result says a one-hot matmul beats a scatter-add. This A/Bs the
same restructuring inside the SGNS step:

  emb_in  -= lr * onehot(centers)^T            @ du        (1 matmul)
  emb_out -= lr * onehot([contexts; negs])^T   @ [dv+; dv-] (1 matmul)

vs the current 3 scatter-adds. Run on the TPU:

    python tools/sgns_exp.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sgns_math_scatter(emb_in, emb_out, centers, contexts, neg_cdf, key,
                       negatives, lr):
    """The pre-onehot scatter-add update (kept here as the A/B control —
    the package's `_sgns_math` now one-hot-matmuls at V <= 2048)."""
    b = centers.shape[0]
    u = jnp.take(emb_in, centers, axis=0)
    v_pos = jnp.take(emb_out, contexts, axis=0)
    r = jax.random.uniform(key, (b, negatives))
    neg_idx = jnp.searchsorted(neg_cdf, r)
    v_neg = jnp.take(emb_out, neg_idx, axis=0)
    pos_logit = jnp.sum(u * v_pos, axis=-1)
    neg_logit = jnp.einsum("bd,bnd->bn", u, v_neg)
    g_pos = jax.nn.sigmoid(pos_logit) - 1.0
    g_neg = jax.nn.sigmoid(neg_logit)
    du = g_pos[:, None] * v_pos + jnp.einsum("bn,bnd->bd", g_neg, v_neg)
    dv_pos = g_pos[:, None] * u
    dv_neg = g_neg[..., None] * u[:, None, :]
    emb_in = emb_in.at[centers].add(-lr * du)
    emb_out = emb_out.at[contexts].add(-lr * dv_pos)
    emb_out = emb_out.at[neg_idx.reshape(-1)].add(
        -lr * dv_neg.reshape(-1, u.shape[-1])
    )
    loss = -jnp.mean(
        jax.nn.log_sigmoid(pos_logit)
        + jnp.sum(jax.nn.log_sigmoid(-neg_logit), -1)
    )
    return emb_in, emb_out, loss

BATCH = 8192
NEG = 5
DIM = 10
VOCAB = 1001
STEPS = 64


def _sgns_math_onehot(emb_in, emb_out, centers, contexts, neg_cdf, key,
                      negatives, lr):
    b = centers.shape[0]
    v = emb_in.shape[0]
    u = jnp.take(emb_in, centers, axis=0)
    v_pos = jnp.take(emb_out, contexts, axis=0)
    r = jax.random.uniform(key, (b, negatives))
    neg_idx = jnp.searchsorted(neg_cdf, r)
    v_neg = jnp.take(emb_out, neg_idx, axis=0)

    pos_logit = jnp.sum(u * v_pos, axis=-1)
    neg_logit = jnp.einsum("bd,bnd->bn", u, v_neg)
    g_pos = jax.nn.sigmoid(pos_logit) - 1.0
    g_neg = jax.nn.sigmoid(neg_logit)

    du = g_pos[:, None] * v_pos + jnp.einsum("bn,bnd->bd", g_neg, v_neg)
    dv_pos = g_pos[:, None] * u
    dv_neg = (g_neg[..., None] * u[:, None, :]).reshape(-1, u.shape[-1])

    oh_c = jax.nn.one_hot(centers, v, dtype=du.dtype)          # [B, V]
    emb_in = emb_in - lr * jnp.dot(
        oh_c.T, du, preferred_element_type=jnp.float32
    )
    out_ids = jnp.concatenate([contexts, neg_idx.reshape(-1)])  # [B*(1+N)]
    out_g = jnp.concatenate([dv_pos, dv_neg], axis=0)
    oh_o = jax.nn.one_hot(out_ids, v, dtype=out_g.dtype)       # [B(1+N), V]
    emb_out = emb_out - lr * jnp.dot(
        oh_o.T, out_g, preferred_element_type=jnp.float32
    )
    loss = -jnp.mean(
        jax.nn.log_sigmoid(pos_logit)
        + jnp.sum(jax.nn.log_sigmoid(-neg_logit), -1)
    )
    return emb_in, emb_out, loss


@functools.partial(jax.jit, static_argnames=("mode",), donate_argnums=(0, 1))
def epoch(emb_in, emb_out, c_all, x_all, neg_cdf, key, mode="scatter"):
    math_fn = _sgns_math_scatter if mode == "scatter" else _sgns_math_onehot
    keys = jax.random.split(key, c_all.shape[0])

    def body(carry, x):
        ei, eo = carry
        c, cx, k = x
        ei, eo, _ = math_fn(ei, eo, c, cx, neg_cdf, k, NEG, 0.025)
        return (ei, eo), None

    (emb_in, emb_out), _ = jax.lax.scan(
        body, (emb_in, emb_out), (c_all, x_all, keys)
    )
    return emb_in, emb_out


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    c_all = jnp.asarray(
        rng.integers(0, VOCAB, size=(STEPS, BATCH)).astype(np.int32)
    )
    x_all = jnp.asarray(
        rng.integers(0, VOCAB, size=(STEPS, BATCH)).astype(np.int32)
    )
    counts = rng.random(VOCAB).astype(np.float32) + 0.1
    p = counts**0.75
    neg_cdf = jnp.asarray(np.cumsum(p / p.sum()).astype(np.float32))

    for mode in ("scatter", "onehot"):
        ei = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32))
        eo = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32))
        ei, eo = epoch(ei, eo, c_all, x_all, neg_cdf, jax.random.PRNGKey(0),
                       mode=mode)
        np.asarray(ei[0, 0])
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            ei, eo = epoch(ei, eo, c_all, x_all, neg_cdf,
                           jax.random.PRNGKey(i + 1), mode=mode)
            np.asarray(ei[0, 0])
            best = min(best, time.perf_counter() - t0)
        print(
            f"{mode:<8} {best/STEPS*1e3:7.3f} ms/step "
            f"{n/best/1e6:6.2f}M pairs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
