"""A/B: SGNS negative sampling hoisted out of the scan vs in-scan.

NEGATIVE RESULT (v5e, 2026-08-18, CDF-searchsorted era): pre-sampling
every step's negatives before the scan (one vmapped threefry +
searchsorted over [S, B, N], same per-step keys, bit-identical
trajectory) was 17% SLOWER than the in-scan draw (0.577 vs 0.493
ms/step) — the in-scan RNG overlaps with the step's gathers/matmuls,
while the hoisted pass serializes ahead of the scan inside the same
dispatch. 2026-08-19: sampling moved to Walker alias tables (searchsorted
itself measured 42 of 51 ms/step at V=27k — BASELINE.md); this tool now
re-measures the hoist question under alias sampling. In-scan remains the
shipped layout (`item2vec._sgns_scan`).

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

from sparrowrecsys_tpu.embedding.item2vec import (
    _alias_draw, _sgns_math, _sgns_scan, build_alias_table, pack_alias,
)
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
def scan_hoisted(
    emb_in, emb_out, c_all, x_all, neg_packed, key, lr0, step0,
    *, negatives, batch_size, total_steps,
):
    """Negatives pre-sampled for the whole chunk before the scan."""
    steps = c_all.shape[0]
    step_keys = jax.random.split(key, steps)
    neg_all = jax.vmap(
        lambda k: _alias_draw(neg_packed, k, (batch_size, negatives))
    )(step_keys)                                     # [S, B, N]

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
    c_all = jnp.asarray(
        rng.integers(0, VOCAB, (STEPS, BATCH)).astype(np.int32)
    )
    x_all = jnp.asarray(
        rng.integers(0, VOCAB, (STEPS, BATCH)).astype(np.int32)
    )
    p = (rng.random(VOCAB).astype(np.float64) + 0.1) ** 0.75
    neg_packed = pack_alias(*build_alias_table(p))
    kw = dict(negatives=NEG, batch_size=BATCH, total_steps=10 * STEPS)

    fns = {"inscan": _sgns_scan, "hoisted": scan_hoisted}
    state = {
        name: (
            jax.random.uniform(jax.random.PRNGKey(1), (VOCAB, DIM)) - 0.5,
            jnp.zeros((VOCAB, DIM)),
        )
        for name in fns
    }
    # compile
    for name, fn in fns.items():
        ei, eo = fn(*state[name], c_all, x_all, neg_packed,
                    jax.random.PRNGKey(0), 0.025, 0.0, **kw)
        hard_sync(ei)
        state[name] = (ei, eo)
    best = {name: float("inf") for name in fns}
    for i in range(3):
        for name, fn in fns.items():
            ei, eo = state[name]
            t0 = time.perf_counter()
            ei, eo = fn(ei, eo, c_all, x_all, neg_packed,
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
