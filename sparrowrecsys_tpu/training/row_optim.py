"""Row-sparse (lazy) Adam for large embedding tables.

Dense Adam streams params + both moments of EVERY table row each step —
measured 5.7 ms/step at the MFU config (2^20 x 128 user table, ~3.2 GB of
moment traffic; BASELINE.md round-4 decomposition) even though a batch
touches only the gathered rows. This optimizer updates ONLY the rows the
step's feature ids touched: gather their moment rows, run the identical
Adam math, scatter back. The gradient stays dense (XLA fuses the one-hot/
scatter backward into it — measured cheap); what becomes sparse is the
OPTIMIZER state traffic, which dominates at production table sizes
(bytes ~ batch-unique rows instead of the whole vocabulary).

Two layouts ship:

- `row_adam_update` on `RowAdamState(count, mu, nu)` — the reference
  layout (separate moment arrays, 3 row scatters/step). Kept for the
  unit-level contract and the probe's component attribution.
- `fused_row_adam_update` on `FusedRowAdamState(count, buf)` where
  `buf = [table | mu | nu]` as ONE [V, 3D] array — the whole step is
  ONE row gather + ONE row scatter. tools/row_optim_probe.py measured
  the 3-scatter variant scatter-BOUND (~10.8 of 14.2 ms at [2^21, 128],
  65k ids: ~9 GB/s effective — per-scatter-op cost, not bytes), so
  batching the 3 writes into one is the identified lever (round-4
  BASELINE.md "Lazy-Adam overhead ATTRIBUTED"). The Trainer's
  `sparse_tables=` path uses this layout.

Semantics (both layouts): LazyAdam (TF's tf.contrib/addons LazyAdam,
torchrec's row-wise optimizers) — untouched rows' moments are FROZEN,
not decayed toward zero, and bias correction uses the global step count.
This differs from dense Adam for rows with zero gradient (dense decays
their momenta), so it ships OPT-IN (`Trainer(sparse_tables=...)`); when
every row is touched every step the two are numerically identical
(tested).

Reference context: the reference has no optimizer story for large tables
at all (Keras Adam over 30k-row tables, `EmbeddingMLP.py:87-90`); this is
the TPU-native mechanism that keeps the embedding plane scalable past
multi-M-row vocabularies (SURVEY.md §2.7 embedding-table distribution).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RowAdamState(NamedTuple):
    count: jnp.ndarray  # int32 global step (shared bias correction)
    mu: jnp.ndarray     # [V, D] first moment (frozen for untouched rows)
    nu: jnp.ndarray     # [V, D] second moment


def init_row_adam(table: jnp.ndarray) -> RowAdamState:
    return RowAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jnp.zeros_like(table),
        nu=jnp.zeros_like(table),
    )


def _touched_rows(ids: jnp.ndarray, v: int):
    """Flatten ids to (uids, safe): `uids` genuinely sorted ascending and
    all-distinct with every drop slot >= v; `safe` = clip(uids, 0, v-1)
    for reads (sorted, NOT distinct — fill slots collapse onto v-1).

    Every id outside [0, v) — negative OOV encodings AND oversized ids —
    is first routed to v (negative ids would WRAP in numpy-semantics
    scatters; oversized ones would land unsorted after unique). The
    static-size `jnp.unique` then leaves all v-valued slots contiguous at
    the tail (v is the max possible value), and each is replaced by
    v + its position, keeping the array strictly increasing while every
    drop slot stays out of range for `mode="drop"`. This makes the
    `unique_indices=True, indices_are_sorted=True` scatter hints TRUE
    (not merely safe-by-drop), so XLA's parallel no-duplicate scatter
    path is used on solid ground — the hints were measured worth ~2x at
    batch 262144. v + size must fit int32: v <= 2^23 and batch <= 2^19
    in every configured shape, asserted here.
    """
    flat = ids.reshape(-1)
    assert v + flat.shape[0] < 2 ** 31, "fill-slot ids would overflow int32"
    flat = jnp.where((flat < 0) | (flat >= v), v, flat)
    uids = jnp.unique(flat, size=flat.shape[0], fill_value=v)
    uids = jnp.where(
        uids == v, v + jnp.arange(uids.shape[0], dtype=uids.dtype), uids
    )
    safe = jnp.clip(uids, 0, v - 1)
    return uids, safe


def row_adam_update(
    table: jnp.ndarray,
    state: RowAdamState,
    grad: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
):
    """One lazy-Adam step on the rows `ids` touch (3-scatter layout).

    table/grad/mu/nu: [V, D]; ids: int32, any shape (flattened) — the
    feature columns that gathered from this table this step. Duplicate
    ids are collapsed (the dense grad already accumulated them);
    out-of-range ids are ignored. Returns (new_table, new_state).
    """
    v = table.shape[0]
    uids, safe = _touched_rows(ids, v)

    count = state.count + 1
    tf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf

    g = grad.at[safe].get(indices_are_sorted=True)
    mu_rows = state.mu.at[safe].get(indices_are_sorted=True)
    nu_rows = state.nu.at[safe].get(indices_are_sorted=True)
    mu_new = b1 * mu_rows + (1.0 - b1) * g
    nu_new = b2 * nu_rows + (1.0 - b2) * (g * g)
    upd = -learning_rate * (mu_new / c1) / (jnp.sqrt(nu_new / c2) + eps)

    new_table = table.at[uids].add(
        upd, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    new_mu = state.mu.at[uids].set(
        mu_new, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    new_nu = state.nu.at[uids].set(
        nu_new, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    return new_table, RowAdamState(count=count, mu=new_mu, nu=new_nu)


# ----------------------------------------------------------------------
# Fused layout: params + both moments in ONE [V, 3D] buffer.

class FusedRowAdamState(NamedTuple):
    count: jnp.ndarray  # int32 global step (shared bias correction)
    buf: jnp.ndarray    # [V, 3D] = [table | mu | nu] side by side


def init_fused_row_adam(table: jnp.ndarray) -> FusedRowAdamState:
    z = jnp.zeros_like(table)
    buf = jnp.concatenate([table, z, z], axis=1)
    # Row-sharded tables keep their sharding: concat along D preserves the
    # row partitioning; an explicit put avoids a layout surprise when the
    # input carried a NamedSharding.
    shd = getattr(table, "sharding", None)
    if shd is not None and getattr(shd, "mesh", None) is not None:
        buf = jax.device_put(buf, shd)
    return FusedRowAdamState(count=jnp.zeros((), jnp.int32), buf=buf)


def fused_table(state: FusedRowAdamState) -> jnp.ndarray:
    """The parameter table view, [V, D] — buf's first D columns."""
    return state.buf[:, : state.buf.shape[1] // 3]


def fused_row_adam_update(
    state: FusedRowAdamState,
    grad: jnp.ndarray,
    ids: jnp.ndarray,
    *,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
    rowio: bool = False,
) -> FusedRowAdamState:
    """One lazy-Adam step as ONE [U, 3D] gather + ONE [U, 3D] scatter.

    Identical math to `row_adam_update` (tested bit-equal); only the
    memory layout differs. grad: [V, D] dense cotangent for the table.

    rowio=True routes the [U, 3D] row WRITE through the Pallas row-DMA
    kernel (ops/rowio.py rows_write_pallas — the measured 1.25x write
    option); gathers stay XLA, which the probe measured strictly faster
    (24-26 GB/s of rows). Same values either way (drop slots are
    skipped by both write paths). NOTE the kernel's measured support is
    f32 [*, 128] rows — at other widths (including this fused buffer's
    3D when D != 128/3) rows_write_pallas silently falls back to the
    XLA scatter, so the flag is safe but a no-op there; KERNELS.md
    rowio section has the verdict and the wall analysis.
    """
    v, d3 = state.buf.shape
    d = d3 // 3
    uids, safe = _touched_rows(ids, v)

    count = state.count + 1
    tf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf

    rows = state.buf.at[safe].get(indices_are_sorted=True)  # [U, 3D]
    g = grad.at[safe].get(indices_are_sorted=True)
    p = rows[:, :d]
    mu_rows = rows[:, d:2 * d]
    nu_rows = rows[:, 2 * d:]
    mu_new = b1 * mu_rows + (1.0 - b1) * g
    nu_new = b2 * nu_rows + (1.0 - b2) * (g * g)
    upd = -learning_rate * (mu_new / c1) / (jnp.sqrt(nu_new / c2) + eps)

    new_rows = jnp.concatenate([p + upd, mu_new, nu_new], axis=1)
    if rowio:
        from sparrowrecsys_tpu.ops.rowio import rows_write_pallas

        buf = rows_write_pallas(state.buf, uids, new_rows)
    else:
        buf = state.buf.at[uids].set(
            new_rows, mode="drop", unique_indices=True,
            indices_are_sorted=True,
        )
    return FusedRowAdamState(count=count, buf=buf)
