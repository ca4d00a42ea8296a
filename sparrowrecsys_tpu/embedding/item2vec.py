"""Item2vec: skip-gram with negative sampling, fully jitted.

Rebuild of `trainItem2vec` (`offline/spark/embedding/Embedding.scala:128-167`):
Spark MLlib `Word2Vec(vectorSize=10, windowSize=5, numIterations=10)` over
per-user positively-rated watch sequences (`processItemSequence`,
Embedding.scala:34-63: rating >= 3.5, sorted by timestamp, grouped by user).

TPU-native design: sequences are flattened to (center, context) pair arrays
once on host (O(total pairs), numpy); training is a single jitted SGNS step
over large batches — embedding gathers + a [B, 1+neg] dot + sigmoid loss,
with negatives drawn on device from the unigram^0.75 distribution via
Walker alias tables (2 gathers/draw; in-scan `searchsorted` over the CDF
measured 42 ms of a 51 ms step at V=27k — tile-amplified binary-search
gathers, see build_alias_table).

Documented divergence: MLlib Word2Vec optimizes hierarchical softmax;
SGNS is the standard modern equivalent and produces cosine-neighborhoods
of the same quality (validated by the `findSynonyms`-style tests).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import POSITIVE_RATING_THRESHOLD
from sparrowrecsys_tpu.data.movielens import Ratings
from sparrowrecsys_tpu.ops.embedding import ONEHOT_GRAD_MAX_VOCAB


@dataclasses.dataclass(frozen=True)
class Item2VecConfig:
    dim: int = 10                # embLength (Embedding.scala:314)
    window: int = 5              # windowSize (Embedding.scala:132)
    epochs: int = 10             # numIterations (Embedding.scala:133)
    negatives: int = 5
    batch_size: int = 8192
    learning_rate: float = 0.025
    min_count: int = 1           # MLlib default minCount=5; sequences here are tiny
    seed: int = 2024


def build_item_sequences(
    ratings: Ratings, threshold: float = POSITIVE_RATING_THRESHOLD
) -> List[np.ndarray]:
    """Per-user watch sequences of movieIds: rating >= threshold, sorted by
    timestamp (ties keep input order — Embedding.scala:41-45 sorts the
    timestamp *string*, identical ordering for equal-width epoch stamps)."""
    keep = ratings.ratings >= threshold
    u = ratings.user_ids[keep]
    m = ratings.movie_ids[keep]
    t = ratings.timestamps[keep]
    order = np.lexsort((np.arange(len(u)), t, u))
    u, m = u[order], m[order]
    seqs: List[np.ndarray] = []
    if len(u) == 0:
        return seqs
    bounds = np.flatnonzero(np.diff(u)) + 1
    for chunk in np.split(m, bounds):
        if len(chunk) >= 2:
            seqs.append(chunk.astype(np.int64))
    return seqs


def skipgram_pairs(
    sequences: Sequence[np.ndarray], window: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten sequences into (center_idx, context_idx) over a dense vocab.

    Returns (centers, contexts, vocab_ids, counts): centers/contexts are
    indices into vocab_ids (the sorted unique movieIds); counts are vocab
    occurrence counts for the negative-sampling distribution.
    """
    flat = np.concatenate(sequences) if sequences else np.empty(0, np.int64)
    vocab_ids, inv = np.unique(flat, return_inverse=True)
    counts = np.bincount(inv, minlength=len(vocab_ids)).astype(np.float64)

    # Vectorized pair extraction over ALL sequences at once: positions that
    # are >= d steps before their sequence's end pair with the position d
    # ahead (no per-sequence Python loop — scales to 20M-event corpora).
    n_total = len(flat)
    lens = np.array([len(s) for s in sequences], np.int64)
    ends = np.repeat(np.cumsum(lens), lens)          # seq end (excl) per pos
    pos = np.arange(n_total)
    centers_parts, contexts_parts = [], []
    for d in range(1, window + 1):
        ok = pos + d < ends
        a, b = inv[pos[ok]], inv[pos[ok] + d]
        centers_parts.append(a); contexts_parts.append(b)  # center -> right
        centers_parts.append(b); contexts_parts.append(a)  # center -> left
    if centers_parts:
        c = np.concatenate(centers_parts); x = np.concatenate(contexts_parts)
    else:
        c = np.empty(0, np.int64); x = np.empty(0, np.int64)
    return c.astype(np.int32), x.astype(np.int32), vocab_ids, counts


def _sgns_math(emb_in, emb_out, centers, contexts, neg_idx, lr):
    u = jnp.take(emb_in, centers, axis=0)            # [B, D]
    v_pos = jnp.take(emb_out, contexts, axis=0)      # [B, D]
    v_neg = jnp.take(emb_out, neg_idx, axis=0)       # [B, N, D]

    pos_logit = jnp.sum(u * v_pos, axis=-1)          # [B]
    neg_logit = jnp.einsum("bd,bnd->bn", u, v_neg)   # [B, N]

    # Gradients of -log σ(pos) - Σ log σ(-neg), written explicitly — cheaper
    # and clearer than autodiff through the gathers.
    g_pos = jax.nn.sigmoid(pos_logit) - 1.0          # [B]
    g_neg = jax.nn.sigmoid(neg_logit)                # [B, N]

    du = g_pos[:, None] * v_pos + jnp.einsum("bn,bnd->bd", g_neg, v_neg)
    dv_pos = g_pos[:, None] * u
    dv_neg = g_neg[..., None] * u[:, None, :]

    v = emb_in.shape[0]
    if v <= ONEHOT_GRAD_MAX_VOCAB:
        # Apply the three table updates as two one-hot matmuls on the MXU
        # instead of three scatter-adds — measured +10% epoch throughput at
        # the item vocab (tools/sgns_exp.py: 3.94 -> 3.60 ms/step, v5e).
        # Numerically identical accumulation (one-hot^T @ grads sums
        # duplicate ids exactly like scatter-add).
        oh_c = jax.nn.one_hot(centers, v, dtype=du.dtype)          # [B, V]
        emb_in = emb_in - lr * jnp.dot(
            oh_c.T, du, preferred_element_type=jnp.float32
        )
        out_ids = jnp.concatenate([contexts, neg_idx.reshape(-1)])
        out_g = jnp.concatenate(
            [dv_pos, dv_neg.reshape(-1, u.shape[-1])], axis=0
        )
        oh_o = jax.nn.one_hot(out_ids, v, dtype=out_g.dtype)       # [B(1+N), V]
        emb_out = emb_out - lr * jnp.dot(
            oh_o.T, out_g, preferred_element_type=jnp.float32
        )
    else:
        emb_in = emb_in.at[centers].add(-lr * du)
        emb_out = emb_out.at[contexts].add(-lr * dv_pos)
        emb_out = emb_out.at[neg_idx.reshape(-1)].add(
            -lr * dv_neg.reshape(-1, u.shape[-1])
        )
    loss = -jnp.mean(
        jax.nn.log_sigmoid(pos_logit) + jnp.sum(jax.nn.log_sigmoid(-neg_logit), -1)
    )
    return emb_in, emb_out, loss


#: Upper bound on scan length per device dispatch. A 20M-event epoch is
#: ~1200 steps; dispatching it as ONE scan reproducibly crashed the axon
#: TPU worker ("kernel fault", tools/emb_scale.py 2026-08-19) while
#: short dispatches run fine — so an epoch is a python loop of bounded
#: scan chunks (identical math; per-dispatch latency amortizes across
#: 256 steps essentially as well as across 1200).
MAX_STEPS_PER_DISPATCH = 256


@functools.partial(jax.jit, static_argnames=("steps", "batch_size"))
def _perm_pairs(centers, contexts, key, *, steps, batch_size):
    """Apply the epoch permutation ONCE and lay the pairs out as
    contiguous [steps, batch] xs (same restructuring as train_epoch,
    tools/step_exp7.py: a random [B] gather inside the scan reads a whole
    (8, 128) tile per 4-byte index on TPU, so it belongs outside the
    step's critical path)."""
    n = centers.shape[0]
    perm = jax.random.permutation(key, n)
    pad = steps * batch_size - n if steps * batch_size > n else 0
    if pad:
        perm = jnp.concatenate([perm, perm[:pad]])
    perm = perm[: steps * batch_size]
    c_all = jnp.take(centers, perm, axis=0).reshape(steps, batch_size)
    x_all = jnp.take(contexts, perm, axis=0).reshape(steps, batch_size)
    return c_all, x_all


def build_alias_table(p: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Walker alias tables (prob [V] f32, alias [V] i32) for a categorical
    distribution — O(V) host build, O(1) device sampling (2 gathers).

    Replaces in-scan `searchsorted` over the unigram^0.75 CDF, which
    measured 42 ms of a 51 ms SGNS step at V=27k (tools output recorded
    in BASELINE.md): each of its ~15 binary-search iterations random-
    gathers [B*N] 4-byte probes, and every probe reads a whole (8, 128)
    tile — ~20 GB of tile-amplified HBM traffic per step. Alias sampling
    is two gathers total and distribution-exact."""
    p = np.asarray(p, np.float64)
    v = len(p)
    scaled = p / p.sum() * v
    prob = np.ones(v, np.float64)
    alias = np.arange(v, dtype=np.int64)
    small = [i for i in range(v) if scaled[i] < 1.0]
    large = [i for i in range(v) if scaled[i] >= 1.0]
    while small and large:
        s, l = small.pop(), large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)
    return prob.astype(np.float32), alias.astype(np.int32)


def pack_alias(prob: np.ndarray, alias: np.ndarray) -> jnp.ndarray:
    """[V, 2] f32 (prob, alias) so a draw is ONE row gather. The alias id
    rides as float32 — exact for V < 2^24 (ids are small integers)."""
    return jnp.asarray(
        np.stack([prob, alias.astype(np.float32)], axis=1)
    )


def _alias_draw(packed, k, shape):
    ku, kv = jax.random.split(k)
    v = packed.shape[0]
    idx = jax.random.randint(ku, shape, 0, v)
    pa = jnp.take(packed, idx, axis=0)               # [..., 2] one gather
    keep = jax.random.uniform(kv, shape) < pa[..., 0]
    return jnp.where(keep, idx, pa[..., 1].astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("negatives", "batch_size", "total_steps"),
    donate_argnums=(0, 1),
)
def _sgns_scan(
    emb_in, emb_out, c_chunk, x_chunk, neg_packed, key, lr0, step0,
    *, negatives, batch_size, total_steps,
):
    """One scan dispatch over a chunk of pre-permuted steps; lr decays
    linearly with the global step.

    Negative sampling stays IN the scan body: hoisting it out (one
    vmapped threefry + searchsorted over [S, B, N], same keys, bit-
    identical) measured 17% SLOWER (tools/sgns_exp2.py, v5e: 0.577 vs
    0.493 ms/step) — in-scan RNG overlaps with the step's gathers and
    matmuls, while the hoisted version serializes the whole sampling
    pass ahead of the scan inside the same dispatch. Sampling is by
    alias tables (see build_alias_table), not CDF search."""
    steps = c_chunk.shape[0]
    step_keys = jax.random.split(key, steps)

    def body(carry, x):
        ei, eo, t = carry
        c, cx, k = x
        lr = lr0 * jnp.maximum(1.0 - t / total_steps, 1e-4)
        neg = _alias_draw(
            neg_packed, k, (batch_size, negatives)
        )                                            # [B, N] unigram^0.75
        ei, eo, _ = _sgns_math(ei, eo, c, cx, neg, lr)
        return (ei, eo, t + 1.0), None

    (emb_in, emb_out, _), _ = jax.lax.scan(
        body, (emb_in, emb_out, step0), (c_chunk, x_chunk, step_keys)
    )
    return emb_in, emb_out


def train_sgns(
    centers: np.ndarray,
    contexts: np.ndarray,
    vocab_size: int,
    counts: np.ndarray,
    config: Item2VecConfig,
    verbose: bool = False,
) -> np.ndarray:
    """SGNS over pre-extracted pairs; returns the input embedding table.

    Learning rate decays linearly to 1e-4x over training — word2vec's
    schedule (MLlib does the same internally)."""
    v = vocab_size
    if v == 0 or len(centers) == 0:
        return np.zeros((v, config.dim), np.float32)
    neg_packed = pack_alias(*build_alias_table(counts ** 0.75))

    key = jax.random.PRNGKey(config.seed)
    k1, key = jax.random.split(key)
    emb_in = jax.random.uniform(
        k1, (v, config.dim), jnp.float32, -0.5 / config.dim, 0.5 / config.dim
    )
    emb_out = jnp.zeros((v, config.dim), jnp.float32)

    n = len(centers)
    bs = min(config.batch_size, max(n, 1))
    steps = max(n // bs, 1)
    total = float(config.epochs * steps)
    centers_d = jnp.asarray(centers)
    contexts_d = jnp.asarray(contexts)
    chunk = min(steps, MAX_STEPS_PER_DISPATCH)
    import time as _time

    for epoch in range(config.epochs):
        key, kperm = jax.random.split(key)
        t0 = _time.perf_counter()
        c_all, x_all = _perm_pairs(
            centers_d, contexts_d, kperm, steps=steps, batch_size=bs
        )
        # Bounded-length scan dispatches (see MAX_STEPS_PER_DISPATCH). At
        # most two compiled chunk shapes: `chunk` and the remainder.
        for lo in range(0, steps, chunk):
            hi = min(lo + chunk, steps)
            key, sub = jax.random.split(key)
            emb_in, emb_out = _sgns_scan(
                emb_in, emb_out,
                jax.lax.slice_in_dim(c_all, lo, hi),
                jax.lax.slice_in_dim(x_all, lo, hi),
                neg_packed, sub,
                jnp.float32(config.learning_rate),
                jnp.float32(epoch * steps + lo),
                negatives=config.negatives, batch_size=bs,
                total_steps=total,
            )
        if verbose:
            # Forced sync (block_until_ready returns early on axon) so the
            # per-epoch print localizes failures and times honestly.
            _ = np.asarray(emb_in[0, 0])
            print(
                f"  sgns epoch {epoch + 1}/{config.epochs}: "
                f"{_time.perf_counter() - t0:.1f}s "
                f"({steps * bs / (_time.perf_counter() - t0) / 1e6:.2f}M pairs/s)",
                flush=True,
            )
    return np.asarray(emb_in)


def train_item2vec(
    ratings: Ratings, config: Item2VecConfig = Item2VecConfig()
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (vocab_ids [V], embeddings [V, D]) — the item2vecEmb table."""
    seqs = build_item_sequences(ratings)
    centers, contexts, vocab_ids, counts = skipgram_pairs(seqs, config.window)
    emb = train_sgns(centers, contexts, len(vocab_ids), counts, config)
    return vocab_ids, emb


def find_synonyms(
    vocab_ids: np.ndarray, emb: np.ndarray, movie_id: int, k: int = 20
) -> List[Tuple[int, float]]:
    """Cosine top-k neighbours — the `findSynonyms("158", 20)` demo
    (Embedding.scala:139-142)."""
    from sparrowrecsys_tpu.ops.topk import cosine_topk

    pos = np.flatnonzero(vocab_ids == movie_id)
    if len(pos) == 0:
        return []
    scores, idx = cosine_topk(emb[pos], emb, min(k + 1, len(emb)))
    out = []
    for i, s in zip(np.asarray(idx)[0], np.asarray(scores)[0]):
        if vocab_ids[i] != movie_id and len(out) < k:
            out.append((int(vocab_ids[i]), float(s)))
    return out
