"""bf16 scoring under the approx-top-k dispatch (round-2 follow-up).

Round 1 measured bf16 retrieval scoring as a ~2% wash — but that was under
exact `lax.top_k`, whose full sort dominated the latency. With
`lax.approx_max_k` now the measured dispatch at >= 100k items
(KERNELS.md), the cosine matmul is a larger fraction of the time, so
bf16's 2x MXU rate may matter. This measures fp32-approx vs bf16-approx
at 1M/10M items (serving protocol: Q=256, D=64, k=10) plus the realized
recall of the bf16 path against the fp32 EXACT top-k — feeds
`ops/topk.py` dispatch policy if it wins.

    python tools/topk_bf16_exp.py [sizes...]
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

from sparrowrecsys_tpu.ops.topk import cosine_topk, cosine_topk_approx

K = 10
Q = 256
D = 64


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_approx_bf16(q, items, k):
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    mn = items / jnp.maximum(
        jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12
    )
    scores = jnp.dot(
        qn.astype(jnp.bfloat16),
        mn.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return jax.lax.approx_max_k(scores, k, recall_target=0.99)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_approx_bf16_resident(q, items_bf16, k):
    """Items pre-normalized AND pre-cast to bf16 (device-resident catalog:
    halves the HBM the score matmul streams)."""
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    scores = jnp.dot(
        qn.astype(jnp.bfloat16), items_bf16.T, preferred_element_type=jnp.float32
    )
    return jax.lax.approx_max_k(scores, k, recall_target=0.99)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def recall_vs(ia, ie):
    ia, ie = np.asarray(ia), np.asarray(ie)
    return float(np.mean([len(set(a) & set(e)) / K for a, e in zip(ia, ie)]))


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)
    sizes = (
        tuple(int(x) for x in sys.argv[1:])
        if len(sys.argv) > 1
        else (1_000_000, 10_000_000)
    )
    for m in sizes:
        kq, ki = jax.random.split(jax.random.fold_in(key, m))
        q = jax.random.normal(kq, (Q, D), jnp.float32)
        items = jax.random.normal(ki, (m, D), jnp.float32)
        items_bf16 = (
            items
            / jnp.maximum(jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
        ).astype(jnp.bfloat16)
        _sync(items_bf16)

        t_f32 = timeit(cosine_topk_approx, q, items, K)
        t_bf16 = timeit(cosine_topk_approx_bf16, q, items, K)
        t_res = timeit(cosine_topk_approx_bf16_resident, q, items_bf16, K)
        _, ie = cosine_topk(q, items, K)  # exact fp32 ground truth
        _, ia32 = cosine_topk_approx(q, items, K)
        _, ia16 = cosine_topk_approx_bf16(q, items, K)
        _, iar = cosine_topk_approx_bf16_resident(q, items_bf16, K)
        print(
            f"M={m:>11,}  f32-approx {t_f32*1e3:8.3f} ms  "
            f"bf16-approx {t_bf16*1e3:8.3f} ms ({t_f32/t_bf16:4.2f}x)  "
            f"bf16-resident {t_res*1e3:8.3f} ms ({t_f32/t_res:4.2f}x)",
            flush=True,
        )
        print(
            f"             recall@{K} vs exact: f32-approx {recall_vs(ia32, ie):.4f}"
            f"  bf16-approx {recall_vs(ia16, ie):.4f}"
            f"  bf16-resident {recall_vs(iar, ie):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
