"""On-device similarity scoring and top-k retrieval.

Replaces the serving hot loop — per-candidate cosine over boxed Java floats
(`online/model/Embedding.java:63-80`, called 800x per request from
`RecForYouProcess.java:80-83`) and the brute-force embedding scan
(`SimilarMovieProcess.java:113-135`) — with one MXU matmul over the whole
catalog followed by `lax.top_k`. At MovieLens scale a full-catalog exact
top-k is microseconds; LSH (Embedding.scala:274-296) becomes an optional
demo rather than a necessity (SURVEY.md §7 step 5).

`sharded_cosine_topk` scales the same op across a `model`-sharded item
matrix: local top-k per shard, then a gathered merge — the ICI traffic is
k rows per shard, not the catalog.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@jax.jit
def cosine_scores(queries: jnp.ndarray, items: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [M, D] -> cosine [Q, M]. Zero vectors score 0 (the reference
    returns -1 on null embeddings and drops them from ranking; 0 keeps them
    ranked last among non-negative scores — same top-k for valid data)."""
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
    )
    mn = items / jnp.maximum(jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
    return jnp.dot(qn, mn.T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    queries: jnp.ndarray, items: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact cosine top-k: ([Q, k] scores, [Q, k] indices)."""
    scores = cosine_scores(queries, items)
    return jax.lax.top_k(scores, k)


#: Catalog size above which `cosine_topk_auto` switches to the TPU-native
#: approximate top-k. Measured on v5e (tools/topk_bench.py -> KERNELS.md):
#: at 100k items approx is 1.61x faster than exact (realized recall@10
#: 0.996); at 1M items `lax.top_k`'s full sort dominates and
#: `approx_max_k` wins 6.04x (realized recall@10 0.994). Below ~100k the
#: matmul dominates and exact is kept for bitwise-stable serving results.
APPROX_TOPK_MIN_ITEMS = 100_000


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def cosine_topk_approx(
    queries: jnp.ndarray,
    items: jnp.ndarray,
    k: int,
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate cosine top-k via `lax.approx_max_k` — TPU's native
    two-stage (per-partition argmax + rescoring) top-k, avoiding
    `lax.top_k`'s full sort. Guarantees expected recall >=
    `recall_target` against the exact result; realized recall is
    measured and recorded in KERNELS.md."""
    scores = cosine_scores(queries, items)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


def topk_dispatch(n_items: int) -> str:
    """The auto-dispatch decision, exposed so benchmarks/labels can name
    the kernel `cosine_topk_auto` will actually run (one source of truth
    for the measured threshold)."""
    if n_items >= APPROX_TOPK_MIN_ITEMS and jax.default_backend() == "tpu":
        return "approx_max_k"
    return "exact"


def cosine_topk_auto(
    queries: jnp.ndarray, items: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Measured auto-dispatch: exact top-k at catalog sizes where the
    matmul dominates, `approx_max_k` beyond `APPROX_TOPK_MIN_ITEMS`
    (same discipline as ops/fm.py / ops/attention.py)."""
    if topk_dispatch(items.shape[0]) == "approx_max_k":
        return cosine_topk_approx(queries, items, k)
    return cosine_topk(queries, items, k)


def sharded_cosine_topk(
    queries: jnp.ndarray,
    items: jnp.ndarray,
    k: int,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    approx: "bool | None" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over an item matrix row-sharded across `model_axis`.

    Each shard computes local top-k over its rows; an all_gather of the
    [Q, k] partials (k rows per shard over ICI, not the catalog) is merged
    by a second tiny top-k. Queries are replicated.

    approx=None applies the same measured dispatch rule as
    `cosine_topk_auto` to the PER-SHARD stage (approx_max_k when a shard
    block holds >= APPROX_TOPK_MIN_ITEMS rows on TPU); the cross-shard
    merge stays an exact [Q, P*k] top-k either way.
    """
    n_model = mesh.shape[model_axis]
    m = items.shape[0]
    block = -(-m // n_model)
    padded = block * n_model
    if padded != m:
        items = jnp.pad(items, ((0, padded - m), (0, 0)))
    if approx is None:
        approx = (
            block >= APPROX_TOPK_MIN_ITEMS and jax.default_backend() == "tpu"
        )

    def _local(q, it_blk):
        shard = jax.lax.axis_index(model_axis)
        if approx:
            s, i = cosine_topk_approx(q, it_blk, k)
        else:
            s, i = cosine_topk(q, it_blk, k)
        i = i + shard * block
        s_all = jax.lax.all_gather(s, model_axis, axis=1, tiled=True)  # [Q, P*k]
        i_all = jax.lax.all_gather(i, model_axis, axis=1, tiled=True)
        s_top, pos = jax.lax.top_k(s_all, k)
        return s_top, jnp.take_along_axis(i_all, pos, axis=1)

    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(), P(model_axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, items)
