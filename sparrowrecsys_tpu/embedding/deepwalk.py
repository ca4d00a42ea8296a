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


def transition_matrix(
    sequences: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vocab_ids [V], transition [V, V] row-stochastic, item_dist [V]).

    Pair counts over adjacent sequence elements; rows with no outgoing
    edges get a self-loop (masked later).
    """
    if not sequences:
        return np.empty(0, np.int64), np.zeros((0, 0)), np.zeros(0)
    flat = np.concatenate(sequences)
    vocab_ids, inv = np.unique(flat, return_inverse=True)
    v = len(vocab_ids)
    trans = np.zeros((v, v), np.float64)
    offset = 0
    for seq in sequences:
        n = len(seq)
        idx = inv[offset : offset + n]
        offset += n
        if n >= 2:
            np.add.at(trans, (idx[:-1], idx[1:]), 1.0)
    out_count = trans.sum(axis=1)
    total = out_count.sum()
    item_dist = out_count / max(total, 1.0)
    dead = out_count == 0
    trans[dead, np.flatnonzero(dead)] = 1.0  # self-loop on dead ends
    trans = trans / trans.sum(axis=1, keepdims=True)
    return vocab_ids, trans.astype(np.float32), item_dist.astype(np.float32)


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


def random_walks(
    sequences: Sequence[np.ndarray], config: DeepWalkConfig = DeepWalkConfig()
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Returns (vocab_ids, walks as movieId arrays, truncated at dead ends)."""
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
