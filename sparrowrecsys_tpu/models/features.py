"""Shared feature-encoding blocks for the model zoo.

TPU-native replacement for the reference's `tf.feature_column` graphs
(`TFRecModel/.../EmbeddingMLP.py:46-74` and mirrors): instead of a string
-processing DenseFeatures layer per batch, features arrive pre-encoded as
int32 vocab indices (genres, -1 = OOV) and int32 ids (0 = padded history),
so the in-graph work is pure gathers + concat — everything XLA fuses into
the first matmul's input.

Conventions (match `sparrowrecsys_tpu.data.dataset`):
- genre columns: int32 index into the 19-genre vocab, -1 -> zero vector
  (TF embedding_column over vocabulary_list maps OOV to default -1 -> zeros).
- id columns: int32 within [0, buckets); history ids use 0 as mask value
  (`na_value="0"` + `mask_zero=True`, `DIN.py:137`).
- numerics: float32, fed raw (the reference applies no normalization).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparrowrecsys_tpu.config import EMBEDDING_DIM, GENRE_VOCAB
from sparrowrecsys_tpu.ops.embedding import (
    embed_lookup,
    packed_multi_lookup,
    uniform_embed_init,
)

GENRE_COLS = (
    "userGenre1", "userGenre2", "userGenre3", "userGenre4", "userGenre5",
    "movieGenre1", "movieGenre2", "movieGenre3",
)

NUMERIC_COLS = (
    "releaseYear", "movieRatingCount", "movieAvgRating", "movieRatingStddev",
    "userRatingCount", "userAvgRating", "userRatingStddev",
)

HISTORY_COLS = (
    "userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
    "userRatedMovie4", "userRatedMovie5",
)


class GenreEmbed(nn.Module):
    """Per-column 19-vocab embedding; OOV(-1) -> zeros.

    `idx=None` returns the raw [vocab, dim] table (same param path/RNG as
    a lookup call) for callers that fuse several lookups into one gather
    — see `merged_embed_bias`."""

    dim: int = EMBEDDING_DIM
    vocab: int = len(GENRE_VOCAB)

    @nn.compact
    def __call__(self, idx: jnp.ndarray | None) -> jnp.ndarray:
        table = self.param("table", uniform_embed_init(), (self.vocab, self.dim))
        if idx is None:
            return table
        return embed_lookup(table, idx)  # -1 (OOV) -> zero vector


class IdEmbed(nn.Module):
    """Identity-bucket id embedding (movieId 1001 / userId 30001).

    `idx=None` returns the raw table (see GenreEmbed).

    lookup_dtype (e.g. "bfloat16"): cast the table BEFORE the gather —
    params stay fp32 master weights for the optimizer, but the
    random-row traffic (the measured bytes-bound wall: gathers forward,
    scatter backward) moves at half width, for one cheap streaming
    convert of the table per step. Under a bf16 tower this is
    value-identical forward (cast-then-gather == gather-then-cast row
    for row); backward accumulates duplicate-id cotangents in bf16
    before the fp32 convert — quality A/B'd (BASELINE.md bf16-lookup
    section). None = param dtype (default)."""

    buckets: int
    dim: int = EMBEDDING_DIM
    mask_zero: bool = False
    lookup_dtype: str | None = None

    @nn.compact
    def __call__(self, idx: jnp.ndarray | None) -> jnp.ndarray:
        table = self.param("table", uniform_embed_init(), (self.buckets, self.dim))
        if self.lookup_dtype is not None:
            # The barrier forces the narrow copy to MATERIALIZE in HBM
            # (one streaming convert) — without it XLA fuses the convert
            # into the gather, which still reads full-width rows and
            # saves nothing (measured: 53.7 -> 52.3 ms fused vs 47.6
            # ceiling at the MFU shape, BASELINE.md bf16-lookup section).
            table = jax.lax.optimization_barrier(
                table.astype(compute_dtype(self.lookup_dtype))
            )
        if idx is None:
            return table
        return embed_lookup(table, idx, mask_zero=self.mask_zero)


class IdBias(nn.Module):
    """1-d embedding == linear weight over a one-hot indicator column.

    The reference feeds indicator (one-hot) columns into a Dense(1); on TPU a
    [B, V] one-hot matmul is wasted HBM bandwidth — a gather of a [V] weight
    vector is numerically identical.

    `idx=None` returns the raw [buckets, 1] weight column (see GenreEmbed).
    """

    buckets: int

    @nn.compact
    def __call__(self, idx: jnp.ndarray | None) -> jnp.ndarray:
        w = self.param("w", nn.initializers.zeros, (self.buckets, 1))
        if idx is None:
            return w
        return embed_lookup(w, idx)[..., 0]  # OOV/-1 contributes zero


def merged_embed_bias(
    emb_table: jnp.ndarray, bias_col: jnp.ndarray, idx: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One gather for an id column's embedding AND its first-order bias.

    Every random row gather drags a whole (8, 128) HBM tile, and each
    lookup expands to its own clip/take/where chain inside the scanned
    step — so 4 emb + 4 bias gathers cost ~2x what 4 merged gathers do.
    Concatenating the [V, D] table with its [V, 1] bias column in-graph
    (tables are <= 1.3 MB; the copy is noise) and gathering [V, D+1] rows
    is bitwise-identical forward and measured at +72% on the full DeepFM
    train step (tools/step_exp10b.py: 8.91 -> 15.35M ex/s at batch 65536,
    v5e). Param tree unchanged — checkpoints and seed-pinned parity bands
    stay valid.

    Returns (embedding [B, D], bias [B]); OOV/out-of-range idx -> zeros
    for both (same `embed_lookup` semantics as the unfused modules).
    """
    merged = jnp.concatenate([emb_table, bias_col.astype(emb_table.dtype)],
                             axis=1)
    out = embed_lookup(merged, idx)
    return out[..., :-1], out[..., -1]


def packed_embed_bias(columns):
    """`merged_embed_bias` for SEVERAL id columns riding ONE gather.

    columns: sequence of (emb_table [V, D], bias_col [V, 1], idx [B]).
    Each table is first merged with its bias column ([V, D+1], as in
    `merged_embed_bias`), then all merged tables are concatenated
    in-graph and every column's row comes out of one packed
    `packed_multi_lookup` take — bitwise-identical forward to the
    per-column `merged_embed_bias` chain, with a per-table backward
    (see `ops/embedding.py::packed_multi_lookup`). Measured on the full
    DeepFM train step: see tools/step_exp12.py / BASELINE.md.

    Returns a list of (embedding [B, D], bias [B]) pairs.
    """
    merged = [
        jnp.concatenate([emb, bias.astype(emb.dtype)], axis=1)
        for emb, bias, _ in columns
    ]
    outs = packed_multi_lookup(merged, [idx for _, _, idx in columns])
    return [(o[..., :-1], o[..., -1]) for o in outs]


def numeric_stack(
    features: Dict[str, jnp.ndarray], cols: Sequence[str] = NUMERIC_COLS
) -> jnp.ndarray:
    """Stack numeric columns -> [B, len(cols)] float32."""
    return jnp.stack([features[c].astype(jnp.float32) for c in cols], axis=-1)


def history_stack(
    features: Dict[str, jnp.ndarray], length: int = len(HISTORY_COLS)
) -> jnp.ndarray:
    """Stack userRatedMovie1..length -> int32 [B, T] (0 = pad).

    length > 5 reads the extended history columns emitted by
    `build_samples(history_length=N)` — the DIN/DIEN long-history knob."""
    return jnp.stack(
        [features[f"userRatedMovie{k + 1}"] for k in range(length)], axis=-1
    )


def compute_dtype(name: str):
    """Map ModelConfig.compute_dtype to a jnp dtype. bfloat16 hidden layers
    keep fp32 params (flax default param_dtype) and fp32 logits — the
    MXU-native mixed-precision recipe; AUC-neutral at these widths."""
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


class PReLU(nn.Module):
    """Keras-compatible PReLU: learnable per-channel negative slope, init 0."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


class LinParams(nn.Module):
    """nn.Dense's parameters (identical paths, shapes, default inits — so
    checkpoints and seed-pinned parity bands are preserved bitwise) WITHOUT
    applying the matmul: callers fold several small projections into one
    block-diagonal matmul. The MXU pads K and N to 128 lanes, so N separate
    K~10 matmuls waste the array N-fold; one concat(x) @ block-diag(W)
    computes the same numbers (the zero blocks contribute exact 0.0 terms)
    in a single matmul — measured +3.9% on the full DeepFM v2 train step
    and +3.7%/+3.0% for the DIN attention / AUGRU equivalents
    (tools/fold_exp.py, din_exp.py, augru_exp.py)."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def folded_dense(xs, kbs):
    """concat(xs) @ block-diag(kernels) + concat(biases) -> [..., sum N_f].

    xs: per-head inputs [..., K_f]; kbs: matching (kernel [K_f, N_f],
    bias [N_f]) pairs from `LinParams`. Each head's output columns see
    exact 0.0 contributions from the other heads' inputs — same numbers
    as applying the heads separately, one matmul instead of len(xs)."""
    total_k = sum(x.shape[-1] for x in xs)
    total_n = sum(k.shape[1] for k, _ in kbs)
    w = jnp.zeros((total_k, total_n), jnp.float32)
    r = c = 0
    for k, _ in kbs:
        w = jax.lax.dynamic_update_slice(w, k, (r, c))
        r += k.shape[0]
        c += k.shape[1]
    bias = jnp.concatenate([b for _, b in kbs])
    return jnp.concatenate(xs, axis=-1) @ w + bias


def folded_projections(xs, kbs, field_dim: int):
    """`folded_dense` for equal-width field projections, reshaped to
    [B, F, field_dim]."""
    out = folded_dense(xs, kbs)
    return out.reshape(-1, len(xs), field_dim)
