"""Embedding lookup ops, including row-sharded tables over a `model` mesh axis.

Replaces the reference's TF feature-column embedding machinery
(`tf.feature_column.embedding_column` over identity/vocab categorical
columns, `TFRecModel/.../EmbeddingMLP.py:46-64`) and its external
embedding store (Redis keys `i2vEmb:*`/`uEmb:*`,
`offline/spark/embedding/Embedding.scala:154-162`) with device-resident
tables:

- plain gather lookups for replicated tables (XLA lowers to fast dynamic
  gathers on TPU), and
- `sharded_lookup`: a shard_map-based lookup for tables row-sharded across
  the `model` mesh axis — each shard gathers rows it owns, others contribute
  zeros, and a `psum` over the model axis assembles the result on ICI.

Missing-value semantics (SURVEY.md §2.3): vocab index -1 (OOV genre) and
masked id 0 (history pad, `mask_zero=True` in `DIN.py:137`) produce zero
vectors, matching TF's embedding_column-with-default and Keras mask_zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


#: Tables at/below this many rows use a one-hot matmul for the BACKWARD
#: pass instead of a scatter-add. Measured on TPU v5e: each scatter-add in
#: the training backward costs ~0.2 ms regardless of table size (per-op
#: fixed cost); an [B, V<=2048] one-hot matmul rides the MXU instead.
ONEHOT_GRAD_MAX_VOCAB = 2048

#: Small-vocab tables whose embedding dim is at/above this ALSO use the
#: one-hot matmul on the FORWARD pass: a random row gather reads a whole
#: (8, 128) tile per index, so at wide dims the 8 genre lookups streamed
#: ~6.4 ms/step at the MFU config (dim 128, batch 262144 —
#: tools/mfu_probe.py), while the [B, V] one-hot rides the MXU and fuses
#: into the consumer. Numerically EXACT (every one-hot term is exact 0.0
#: or the row itself), so bands/checkpoints are unaffected. At the
#: reference dim 10 the gather wins (r2 measurement: one-hot genres 13.17M
#: vs merged-gather 15.35M ex/s) — hence the dim gate, re-measured at
#: dim 128 in tools/mfu_probe.py before landing.
ONEHOT_FWD_MIN_DIM = 64


@jax.custom_vjp
def _gather_onehot_grad(table: jnp.ndarray, safe_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, safe_ids, axis=0)


def _gather_oh_fwd(table, safe_ids):
    return jnp.take(table, safe_ids, axis=0), (safe_ids, table.shape[0])


def _gather_oh_bwd(res, g):
    safe_ids, v = res
    flat_ids = safe_ids.reshape(-1)
    flat_g = g.reshape(len(flat_ids), -1)
    oh = jax.nn.one_hot(flat_ids, v, dtype=flat_g.dtype)        # [N, V]
    grad_table = jnp.dot(oh.T, flat_g, preferred_element_type=jnp.float32)
    return grad_table, None


_gather_onehot_grad.defvjp(_gather_oh_fwd, _gather_oh_bwd)


def embed_lookup(
    table: jnp.ndarray, ids: jnp.ndarray, *, mask_zero: bool = False
) -> jnp.ndarray:
    """Gather rows; any id outside [lo, V) -> zero vector, where lo = 1
    with mask_zero (history pad) and 0 otherwise. Negative ids (OOV genre
    encoding) are always zeroed.

    table: [V, D]; ids: int32 [...]; returns [..., D]. The reference's
    `categorical_column_with_identity` raises on out-of-range ids; inside
    jit we can't raise, and clamping would silently alias every oversized
    id onto the last row — zeroing is the safe in-graph behaviour.

    Small-vocab tables (V <= ONEHOT_GRAD_MAX_VOCAB) use a one-hot-matmul
    backward (MXU) instead of the default scatter-add VJP — numerically
    identical gradients at a fraction of the per-op cost.
    """
    v = table.shape[0]
    safe = jnp.clip(ids, 0, v - 1)
    if v <= ONEHOT_GRAD_MAX_VOCAB and table.shape[1] >= ONEHOT_FWD_MIN_DIM:
        # One-hot matmul FORWARD (exact row selection on the MXU; its
        # autodiff backward is precisely the one-hot grad matmul).
        oh = jax.nn.one_hot(safe.reshape(-1), v, dtype=table.dtype)
        out = jnp.dot(
            oh, table, preferred_element_type=table.dtype
        ).reshape(safe.shape + (table.shape[1],))
    elif v <= ONEHOT_GRAD_MAX_VOCAB:
        out = _gather_onehot_grad(table, safe)
    else:
        out = jnp.take(table, safe, axis=0)
    lo = 1 if mask_zero else 0  # mask_zero additionally zeroes id 0
    valid = (ids >= lo) & (ids < v)
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _packed_lookup(lo: tuple, tables: tuple, ids: tuple) -> tuple:
    return _packed_impl(lo, tables, ids)


def _packed_impl(lo, tables, ids):
    vs = [t.shape[0] for t in tables]
    offs = [0]
    for v in vs[:-1]:
        offs.append(offs[-1] + v)
    big = jnp.concatenate(tables, axis=0)
    gidx = jnp.stack(
        [jnp.clip(i, 0, v - 1) + o for i, v, o in zip(ids, vs, offs)], axis=0
    )  # [T, B]
    rows = jnp.take(big, gidx, axis=0)  # [T, B, D]
    valid = jnp.stack(
        [(i >= l) & (i < v) for i, l, v in zip(ids, lo, vs)], axis=0
    )
    out = jnp.where(valid[..., None], rows, 0.0)
    return tuple(out[t] for t in range(len(tables)))


def _packed_fwd(lo, tables, ids):
    return _packed_impl(lo, tables, ids), (tuple(t.shape[0] for t in tables), ids)


def _packed_bwd(lo, res, g):
    vs, ids = res
    grads = []
    for t, gt in enumerate(g):
        v = vs[t]
        valid = (ids[t] >= lo[t]) & (ids[t] < v)
        gm = jnp.where(valid[..., None], gt, 0.0)
        flat_ids = jnp.clip(ids[t], 0, v - 1).reshape(-1)
        flat_g = gm.reshape(len(flat_ids), -1)
        if v <= ONEHOT_GRAD_MAX_VOCAB:
            oh = jax.nn.one_hot(flat_ids, v, dtype=flat_g.dtype)  # [N, V]
            grads.append(
                jnp.dot(oh.T, flat_g, preferred_element_type=jnp.float32)
            )
        else:
            grads.append(
                jnp.zeros((v, flat_g.shape[-1]), flat_g.dtype)
                .at[flat_ids]
                .add(flat_g)
            )
    return tuple(grads), tuple(None for _ in ids)


_packed_lookup.defvjp(_packed_fwd, _packed_bwd)


def packed_multi_lookup(
    tables, ids, lo=None
) -> tuple:
    """ONE gather for several per-column lookups across different tables.

    tables: sequence of [V_t, D] (same D); ids: matching int32 [B] columns;
    lo: per-column valid lower bound (1 for mask_zero history columns, 0
    otherwise). Returns a tuple of [B, D] rows with `embed_lookup`'s
    missing-value semantics per column — bitwise-identical forward.

    Why: each `embed_lookup` expands to its own clip/take/where chain in
    the scanned train step, and per-op overhead — not table bandwidth —
    is the measured cost of the lookup block (BASELINE.md, step_exp10:
    zeroing all lookups gives 42M ex/s fwd-only vs 20.9M with them). The
    tables are concatenated IN-GRAPH (tiny — the copy is noise; the flax
    param tree is unchanged) and all columns ride one [T, B] `take`.

    Why custom VJP: the round-2 unified-table experiment (step_exp9) was
    21% SLOWER *because its backward* concentrated into one scatter of
    T*B rows into the concatenated table. Splitting the backward per
    table — one-hot matmul at V <= ONEHOT_GRAD_MAX_VOCAB, scatter-add
    above, exactly `embed_lookup`'s policy — keeps the measured-cheap
    backward while the forward pays one gather instead of T.
    """
    tables = tuple(tables)
    ids = tuple(ids)
    lo = tuple(lo) if lo is not None else tuple(0 for _ in tables)
    return _packed_lookup(lo, tables, ids)


def sharded_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jnp.ndarray:
    """Lookup into a table row-sharded over `model_axis`.

    The table [V, D] is split into contiguous row blocks, one per model
    shard. ids [B] are replicated across the model axis (sharded over the
    data axis with the batch). Each shard gathers the rows it owns and
    zero-fills the rest; a psum over the model axis reduces the partial
    gathers — one small ICI all-reduce instead of a host parameter server
    (the role Redis plays in the reference serving path).

    Returns [B, D] sharded over the data axis, replicated over model.
    """
    n_model = mesh.shape[model_axis]
    v = table.shape[0]
    block = -(-v // n_model)  # rows per shard (ceil)

    def _local(table_blk: jnp.ndarray, ids_blk: jnp.ndarray) -> jnp.ndarray:
        shard = jax.lax.axis_index(model_axis)
        lo = shard * block
        local = ids_blk - lo
        hit = (local >= 0) & (local < table_blk.shape[0])
        safe = jnp.clip(local, 0, table_blk.shape[0] - 1)
        part = jnp.take(table_blk, safe, axis=0)
        part = jnp.where(hit[..., None], part, 0.0)
        return jax.lax.psum(part, model_axis)

    padded_v = block * n_model
    if padded_v != v:
        table = jnp.pad(table, ((0, padded_v - v), (0, 0)))
    return shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis, None),
        check_vma=False,
    )(table, ids)


def uniform_embed_init(scale: float = 0.05):
    """TF-compatible embedding init: Keras Embedding uses uniform(-0.05, 0.05);
    feature-column embedding_column defaults to truncated_normal(1/sqrt(dim)).
    Uniform is the stabler choice for dim-10 tables; AUC parity holds for both.
    """

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init
