"""A/B: SGNS negative sampling hoisted out of the scan vs in-scan.

NEGATIVE RESULT (v5e, 2026-08-18): pre-sampling every step's negatives
before the scan (one vmapped threefry + searchsorted over [S, B, N],
same per-step keys, bit-identical trajectory) is 17% SLOWER than the
in-scan draw (0.577 vs 0.493 ms/step) — the in-scan RNG overlaps with
the step's gathers/matmuls, while the hoisted pass serializes ahead of
the scan inside the same dispatch. `_sgns_epoch` keeps in-scan sampling;
this tool preserves the hoisted variant for re-measure.

    python tools/sgns_exp2.py
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

from sparrowrecsys_tpu.embedding.item2vec import _sgns_epoch, _sgns_math
from sparrowrecsys_tpu.training.loop import hard_sync

VOCAB = 1001
DIM = 10
BATCH = 1024
STEPS = 256
NEG = 5


@functools.partial(
    jax.jit,
    static_argnames=("negatives", "batch_size", "total_steps"),
    donate_argnums=(0, 1),
)
def epoch_hoisted(
    emb_in, emb_out, centers, contexts, neg_cdf, key, lr0, step0,
    *, negatives, batch_size, total_steps,
):
    """Negatives pre-sampled before the scan (the losing variant)."""
    n = centers.shape[0]
    steps = max(n // batch_size, 1)
    kperm, kscan = jax.random.split(key)
    perm = jax.random.permutation(kperm, n)[: steps * batch_size]
    c_all = jnp.take(centers, perm, axis=0).reshape(steps, batch_size)
    x_all = jnp.take(contexts, perm, axis=0).reshape(steps, batch_size)
    step_keys = jax.random.split(kscan, steps)
    r = jax.vmap(
        lambda k: jax.random.uniform(k, (batch_size, negatives))
    )(step_keys)
    neg_all = jnp.searchsorted(neg_cdf, r)           # [S, B, N]

    def body(carry, x):
        ei, eo, t = carry
        c, cx, neg = x
        lr = lr0 * jnp.maximum(1.0 - t / total_steps, 1e-4)
        ei, eo, _ = _sgns_math(ei, eo, c, cx, neg, lr)
        return (ei, eo, t + 1.0), None

    (emb_in, emb_out, _), _ = jax.lax.scan(
        body, (emb_in, emb_out, step0), (c_all, x_all, neg_all)
    )
    return emb_in, emb_out


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    centers = jnp.asarray(rng.integers(0, VOCAB, n).astype(np.int32))
    contexts = jnp.asarray(rng.integers(0, VOCAB, n).astype(np.int32))
    p = (rng.random(VOCAB).astype(np.float32) + 0.1) ** 0.75
    neg_cdf = jnp.asarray(np.cumsum(p / p.sum()).astype(np.float32))
    kw = dict(negatives=NEG, batch_size=BATCH, total_steps=10 * STEPS)

    fns = {"inscan": _sgns_epoch, "hoisted": epoch_hoisted}
    state = {
        name: (
            jax.random.uniform(jax.random.PRNGKey(1), (VOCAB, DIM)) - 0.5,
            jnp.zeros((VOCAB, DIM)),
        )
        for name in fns
    }
    # compile
    for name, fn in fns.items():
        ei, eo = fn(*state[name], centers, contexts, neg_cdf,
                    jax.random.PRNGKey(0), 0.025, 0.0, **kw)
        hard_sync(ei)
        state[name] = (ei, eo)
    best = {name: float("inf") for name in fns}
    for i in range(3):
        for name, fn in fns.items():
            ei, eo = state[name]
            t0 = time.perf_counter()
            ei, eo = fn(ei, eo, centers, contexts, neg_cdf,
                        jax.random.PRNGKey(i + 1), 0.025, 0.0, **kw)
            hard_sync(ei)
            best[name] = min(best[name], time.perf_counter() - t0)
            state[name] = (ei, eo)
    for name in fns:
        b = best[name]
        print(
            f"{name:<8} {b / STEPS * 1e3:7.3f} ms/step "
            f"{n / b / 1e6:6.2f}M pairs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
