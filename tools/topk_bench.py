"""Exact vs approximate retrieval top-k on real TPU.

`lax.top_k` full-sorts the score row; at large catalogs the sort, not the
cosine matmul, dominates retrieval latency (measured r1: bf16 scoring
gained ~2% because top_k bound). `lax.approx_max_k` is the TPU-native
two-stage top-k. This measures both at serving shapes AND the realized
recall of approx vs exact — numbers feed `ops/topk.py::
APPROX_TOPK_MIN_ITEMS` and KERNELS.md.

    python tools/topk_bench.py
"""

from __future__ import annotations

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


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    key = jax.random.PRNGKey(0)
    import sys

    sizes = (
        tuple(int(x) for x in sys.argv[1:])
        if len(sys.argv) > 1
        else (100_000, 1_000_000)
    )
    for m in sizes:
        kq, ki = jax.random.split(jax.random.fold_in(key, m))
        q = jax.random.normal(kq, (Q, D), jnp.float32)
        items = jax.random.normal(ki, (m, D), jnp.float32)
        t_exact = timeit(cosine_topk, q, items, K)
        t_approx = timeit(cosine_topk_approx, q, items, K)
        # realized recall of approx vs exact
        _, ie = cosine_topk(q, items, K)
        _, ia = cosine_topk_approx(q, items, K)
        ie, ia = np.asarray(ie), np.asarray(ia)
        rec = np.mean(
            [len(set(a) & set(e)) / K for a, e in zip(ia, ie)]
        )
        print(
            f"M={m:>9,}  exact {t_exact*1e3:8.3f} ms  "
            f"approx {t_approx*1e3:8.3f} ms  "
            f"speedup {t_exact/t_approx:5.2f}x  realized recall@{K} {rec:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
