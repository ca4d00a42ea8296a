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


#: Catalog size above which `prepare_catalog` stores the normalized item
#: matrix in bfloat16. Measured on v5e (tools/topk_bf16_exp.py, Q=256
#: D=64 k=10, forced sync): casting inside the kernel gains NOTHING (the
#: fp32 table still streams from HBM), but a pre-normalized bf16-RESIDENT
#: catalog halves the bytes the score matmul reads — 1.16x at 300k items,
#: 1.37x at 2M, 1.52x at 4M, 1.72x at 10M (5.22 vs 8.99 ms/wave), with
#: realized recall@10 vs fp32-exact IDENTICAL to the fp32-approx path at
#: every size (0.994-0.998). Below 300k the approx-top-k stage dominates
#: and fp32 is kept for bitwise-stable serving results.
RESIDENT_BF16_MIN_ITEMS = 300_000


@functools.partial(jax.jit, static_argnames=("dtype",))
def _normalize_rows(items: jnp.ndarray, dtype) -> jnp.ndarray:
    mn = items / jnp.maximum(jnp.linalg.norm(items, axis=-1, keepdims=True), 1e-12)
    return mn.astype(dtype)


class PreparedCatalog:
    """Type-level witness that an item matrix went through
    `prepare_catalog` (rows normalized, possibly bf16-resident). The
    prepared entry points only accept this wrapper, so a raw un-normalized
    matrix can't be fed to the skip-normalization path by mistake
    (ADVICE r2 #3 — silently wrong rankings otherwise)."""

    __slots__ = ("rows",)

    def __init__(self, rows: jnp.ndarray):
        self.rows = rows

    @property
    def shape(self):
        return self.rows.shape

    @property
    def dtype(self):
        return self.rows.dtype


def prepare_catalog(items: jnp.ndarray, dtype=None) -> PreparedCatalog:
    """One-time serving-side preparation of an item matrix for repeated
    top-k queries: row-normalize once (instead of per call) and, on TPU
    at >= `RESIDENT_BF16_MIN_ITEMS` rows, store bf16 — half the HBM
    footprint AND half the bytes every query wave streams (measured
    1.72x at 10M items, recall-neutral; see RESIDENT_BF16_MIN_ITEMS).
    Pass `dtype` explicitly to override the measured policy. fp32
    preparation is numerically identical to the unprepared path."""
    if dtype is None:
        if (
            items.shape[0] >= RESIDENT_BF16_MIN_ITEMS
            and jax.default_backend() == "tpu"
        ):
            dtype = jnp.bfloat16
        else:
            dtype = items.dtype
    return PreparedCatalog(_normalize_rows(items, dtype))


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _topk_prepared(queries, prepared, k, approx):
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
    )
    scores = jnp.dot(
        qn.astype(prepared.dtype), prepared.T,
        preferred_element_type=jnp.float32,
    )
    if approx:
        return jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return jax.lax.top_k(scores, k)


def cosine_topk_prepared(
    queries: jnp.ndarray, prepared: PreparedCatalog, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k against a `prepare_catalog` output: skips the per-call item
    normalization and applies the same measured exact/approx dispatch as
    `cosine_topk_auto`. Scores are always fp32 (bf16 inputs accumulate
    in fp32 via `preferred_element_type`)."""
    if not isinstance(prepared, PreparedCatalog):
        raise TypeError(
            "cosine_topk_prepared needs a prepare_catalog() output "
            "(PreparedCatalog); got a raw array — its rows may not be "
            "normalized, which would silently corrupt the ranking."
        )
    approx = topk_dispatch(prepared.shape[0]) == "approx_max_k"
    return _topk_prepared(queries, prepared.rows, k, approx)


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
    prepared: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k over an item matrix row-sharded across `model_axis`.

    Each shard computes local top-k over its rows; an all_gather of the
    [Q, k] partials (k rows per shard over ICI, not the catalog) is merged
    by a second tiny top-k. Queries are replicated.

    approx=None applies the same measured dispatch rule as
    `cosine_topk_auto` to the PER-SHARD stage (approx_max_k when a shard
    block holds >= APPROX_TOPK_MIN_ITEMS rows on TPU); the cross-shard
    merge stays an exact [Q, P*k] top-k either way.

    prepared=True means `items` came from `prepare_catalog` (rows already
    normalized, possibly bf16-resident): the per-shard stage skips the
    normalization and streams half the bytes — row normalization is
    row-local, so sharding commutes with preparation. A `PreparedCatalog`
    passed as `items` implies prepared=True; passing prepared=True with a
    raw array is a TypeError (ADVICE r2 #3).
    """
    if isinstance(items, PreparedCatalog):
        items, prepared = items.rows, True
    elif prepared:
        raise TypeError(
            "sharded_cosine_topk(prepared=True) needs a prepare_catalog() "
            "output (PreparedCatalog), not a raw array."
        )
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
        if prepared:
            s, i = _topk_prepared(q, it_blk, k, approx)
        elif approx:
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
