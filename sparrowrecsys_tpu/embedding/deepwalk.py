"""DeepWalk: on-device vectorized random walks + skip-gram retraining.

Rebuild of the graph-embedding path (`offline/spark/embedding/Embedding.scala:
225-311`): adjacent-pair counts -> row-normalized transition matrix + global
item distribution (`generateTransitionMatrix`, 225-271), then 20,000 walks
of length 10 sampled ON THE DRIVER one step at a time (`oneRandomWalk`/
`randomWalk`, 170-222), then Word2Vec over the walks (`graphEmb`, 299-311).

TPU-native design: the transition matrix is a dense [V, V] array (MovieLens:
~900x900 ~ 3 MB), walks are one `lax.scan` over walk length with all 20,000
walkers advanced per step via `jax.random.categorical` on gathered logit
rows — the whole sampling phase is a single compiled program.

Walk-termination parity: the reference stops a walk when the current item
has no outgoing edges (Embedding.scala:186-200). Dead-end rows here carry a
self-loop and the walk position is masked from that step on, producing
identical pair statistics (self-pairs are dropped during pair extraction).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.data.movielens import Ratings
from sparrowrecsys_tpu.embedding.item2vec import (
    Item2VecConfig,
    build_item_sequences,
)


@dataclasses.dataclass(frozen=True)
class DeepWalkConfig:
    sample_count: int = 20000    # Embedding.scala:305
    sample_length: int = 10      # Embedding.scala:306
    seed: int = 2024
    item2vec: Item2VecConfig = Item2VecConfig()


def adjacent_pairs(
    sequences: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vocab_ids [V], src [P], dst [P]): every adjacent (item, next-item)
    pair across all sequences as dense vocab indices — vectorized over the
    flattened corpus (no per-sequence Python loop; the r2 implementation's
    `np.add.at` per sequence was O(#users) Python at 20M-event scale)."""
    if not sequences:
        e = np.empty(0, np.int64)
        return e, e.astype(np.int32), e.astype(np.int32)
    flat = np.concatenate(sequences)
    vocab_ids, inv = np.unique(flat, return_inverse=True)
    lens = np.array([len(s) for s in sequences], np.int64)
    ends = np.repeat(np.cumsum(lens), lens)
    pos = np.arange(len(flat))
    ok = pos + 1 < ends
    return vocab_ids, inv[pos[ok]].astype(np.int32), inv[pos[ok] + 1].astype(np.int32)


def transition_matrix(
    sequences: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vocab_ids [V], transition [V, V] row-stochastic, item_dist [V]).

    Pair counts over adjacent sequence elements; rows with no outgoing
    edges get a self-loop (masked later). Dense — use `transition_csr`
    above ~4k items (a 27k-item catalog would be a 2.9 GB matrix)."""
    vocab_ids, src, dst = adjacent_pairs(sequences)
    v = len(vocab_ids)
    if v == 0:
        return vocab_ids, np.zeros((0, 0)), np.zeros(0)
    trans = np.zeros((v, v), np.float64)
    np.add.at(trans, (src, dst), 1.0)
    out_count = trans.sum(axis=1)
    total = out_count.sum()
    item_dist = out_count / max(total, 1.0)
    dead = out_count == 0
    trans[dead, np.flatnonzero(dead)] = 1.0  # self-loop on dead ends
    trans = trans / trans.sum(axis=1, keepdims=True)
    return vocab_ids, trans.astype(np.float32), item_dist.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class TransitionCSR:
    """Row-compressed weighted item graph for large catalogs.

    rowptr [V+1]; dst [E] neighbor indices; cum [E] within-row cumulative
    probabilities (each row's slice ends at 1.0); item_dist [V] global
    edge-frequency start distribution (`generateTransitionMatrix`'s
    itemDistribution, Embedding.scala:253-261)."""

    vocab_ids: np.ndarray
    rowptr: np.ndarray
    dst: np.ndarray
    cum: np.ndarray
    item_dist: np.ndarray


def transition_csr(sequences: Sequence[np.ndarray]) -> TransitionCSR:
    """Sparse equivalent of `transition_matrix`: memory O(E) not O(V^2).
    20M events / 27k items: ~dozens of MB instead of 2.9 GB."""
    vocab_ids, src, dst = adjacent_pairs(sequences)
    v = len(vocab_ids)
    if v == 0:
        z = np.zeros(0)
        return TransitionCSR(vocab_ids, np.zeros(1, np.int32), z.astype(np.int32), z, z)
    # Deduplicate edges: count multiplicity of (src, dst).
    key = src.astype(np.int64) * v + dst.astype(np.int64)
    uniq, counts = np.unique(key, return_counts=True)
    e_src = (uniq // v).astype(np.int32)
    e_dst = (uniq % v).astype(np.int32)
    w = counts.astype(np.float64)
    # uniq is sorted by (src, dst) already -> CSR layout is just rowptr.
    out_count = np.bincount(e_src, weights=w, minlength=v)
    rowptr = np.zeros(v + 1, np.int64)
    np.cumsum(np.bincount(e_src, minlength=v), out=rowptr[1:])
    cum = np.cumsum(w)
    row_base = np.concatenate([[0.0], cum])[rowptr[:-1]]
    row_tot = np.maximum(out_count, 1e-30)
    cum_in_row = (cum - np.repeat(row_base, np.diff(rowptr))) / np.repeat(
        row_tot, np.diff(rowptr)
    )
    item_dist = out_count / max(out_count.sum(), 1.0)
    return TransitionCSR(
        vocab_ids, rowptr.astype(np.int32), e_dst,
        cum_in_row.astype(np.float32), item_dist.astype(np.float32),
    )


@functools.partial(jax.jit, static_argnames=("n_walks", "length", "bisect_iters"))
def _walk_csr(key, rowptr, dst, cum, log_dist, n_walks, length, bisect_iters):
    """All walkers advance one edge per scan step; the per-row categorical
    is a vectorized bisection over the walker's CSR row slice (fixed
    `bisect_iters` gathers instead of a [W, V] dense logits gather — the
    dense walker's working set at V=27k would be 2.2 GB/step)."""
    k0, key = jax.random.split(key)
    start = jax.random.categorical(k0, log_dist[None, :], shape=(1, n_walks))[0]

    def step(carry, k):
        cur, alive = carry
        lo = jnp.take(rowptr, cur)               # [W] row start
        hi = jnp.take(rowptr, cur + 1)           # [W] row end (excl)
        alive = alive & (hi > lo)                # dead end: no out-edges
        u = jax.random.uniform(k, cur.shape)
        # invariant: answer index in [lo, hi); cum[idx] is the first >= u
        l, h = lo, jnp.maximum(hi - 1, lo)
        for _ in range(bisect_iters):
            mid = (l + h) // 2
            go_right = jnp.take(cum, mid) < u
            l = jnp.where(go_right, jnp.minimum(mid + 1, h), l)
            h = jnp.where(go_right, h, mid)
        nxt = jnp.where(alive, jnp.take(dst, l), cur)
        return (nxt, alive), (nxt, alive)

    keys = jax.random.split(key, length - 1)
    (_, _), (steps, alives) = jax.lax.scan(
        step, (start, jnp.ones_like(start, dtype=bool)), keys
    )
    walks = jnp.concatenate([start[None, :], steps], axis=0).T
    valid = jnp.concatenate([jnp.ones((1, n_walks), bool), alives], axis=0).T
    return walks, valid


def random_walks_csr(
    csr: TransitionCSR, config: DeepWalkConfig = DeepWalkConfig()
) -> List[np.ndarray]:
    """Sparse-graph walk sampling; same termination semantics as the dense
    path (stop at rows with no outgoing edges, Embedding.scala:186-200)."""
    v = len(csr.vocab_ids)
    if v == 0:
        return []
    max_deg = int(np.diff(csr.rowptr).max()) if len(csr.dst) else 1
    iters = max(int(np.ceil(np.log2(max(max_deg, 2)))) + 1, 1)
    log_dist = jnp.log(jnp.asarray(csr.item_dist) + 1e-30)
    walks, valid = _walk_csr(
        jax.random.PRNGKey(config.seed), jnp.asarray(csr.rowptr),
        jnp.asarray(csr.dst), jnp.asarray(csr.cum), log_dist,
        config.sample_count, config.sample_length, iters,
    )
    walks = np.asarray(walks)
    valid = np.asarray(valid)
    out = []
    for w, m in zip(walks, valid):
        length = int(m.sum())
        out.append(csr.vocab_ids[w[:length]])
    return out


@functools.partial(jax.jit, static_argnames=("n_walks", "length"))
def _walk(key, log_trans, log_dist, dead, n_walks, length):
    k0, key = jax.random.split(key)
    start = jax.random.categorical(k0, log_dist[None, :], shape=(1, n_walks))[0]

    def step(carry, k):
        cur, alive = carry
        logits = jnp.take(log_trans, cur, axis=0)        # [W, V]
        nxt = jax.random.categorical(k, logits, axis=-1)
        alive = alive & ~jnp.take(dead, cur)
        nxt = jnp.where(alive, nxt, cur)
        return (nxt, alive), (nxt, alive)

    keys = jax.random.split(key, length - 1)
    (_, _), (steps, alives) = jax.lax.scan(
        step, (start, jnp.ones_like(start, dtype=bool)), keys
    )
    walks = jnp.concatenate([start[None, :], steps], axis=0).T    # [W, L]
    valid = jnp.concatenate(
        [jnp.ones((1, n_walks), bool), alives], axis=0
    ).T                                                           # [W, L]
    return walks, valid


#: Above this many distinct items the dense [V, V] transition matrix and
#: the [W, V] per-step logits gather stop being reasonable (27k items =
#: 2.9 GB matrix); random_walks switches to the CSR walker.
DENSE_WALK_MAX_VOCAB = 4096


def random_walks(
    sequences: Sequence[np.ndarray], config: DeepWalkConfig = DeepWalkConfig()
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Returns (vocab_ids, walks as movieId arrays, truncated at dead ends)."""
    n_items = len(np.unique(np.concatenate(sequences))) if sequences else 0
    if n_items > DENSE_WALK_MAX_VOCAB:
        csr = transition_csr(sequences)
        return csr.vocab_ids, random_walks_csr(csr, config)
    vocab_ids, trans, dist = transition_matrix(sequences)
    if len(vocab_ids) == 0:
        return vocab_ids, []
    eps = 1e-30
    log_trans = jnp.log(jnp.asarray(trans) + eps)
    log_dist = jnp.log(jnp.asarray(dist) + eps)
    dead = jnp.asarray(dist == 0)
    walks, valid = _walk(
        jax.random.PRNGKey(config.seed), log_trans, log_dist, dead,
        config.sample_count, config.sample_length,
    )
    walks = np.asarray(walks)
    valid = np.asarray(valid)
    out = []
    for w, m in zip(walks, valid):
        length = int(m.sum())
        out.append(vocab_ids[w[:length]])
    return vocab_ids, out


def train_deepwalk(
    ratings: Ratings, config: DeepWalkConfig = DeepWalkConfig()
) -> Tuple[np.ndarray, np.ndarray]:
    """Full graphEmb path: sequences -> walks -> skip-gram. Returns
    (vocab_ids, embeddings)."""
    from sparrowrecsys_tpu.embedding.item2vec import skipgram_pairs, train_sgns

    seqs = build_item_sequences(ratings)
    _, walks = random_walks(seqs, config)
    cfg = config.item2vec
    centers, contexts, vocab_ids, counts = skipgram_pairs(walks, cfg.window)
    emb = train_sgns(centers, contexts, len(vocab_ids), counts, cfg)
    return vocab_ids, emb
