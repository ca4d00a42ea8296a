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

Semantics: LazyAdam (TF's tf.contrib/addons LazyAdam, torchrec's row-wise
optimizers) — untouched rows' moments are FROZEN, not decayed toward
zero, and bias correction uses the global step count. This differs from
dense Adam for rows with zero gradient (dense decays their momenta), so
it ships OPT-IN (`Trainer(sparse_tables=...)`); when every row is touched
every step the two are numerically identical (tested).

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
    """One lazy-Adam step on the rows `ids` touch.

    table/grad/mu/nu: [V, D]; ids: int32, any shape (flattened) — the
    feature columns that gathered from this table this step. Duplicate
    ids are collapsed (the dense grad already accumulated them);
    out-of-range ids are ignored. Returns (new_table, new_state).
    """
    v = table.shape[0]
    flat = ids.reshape(-1)
    # Negative ids (OOV genre encoding) would WRAP in the scatter (JAX
    # .at[] keeps numpy semantics) — route them to the drop slot.
    flat = jnp.where(flat < 0, v, flat)
    # Static-size unique: fill slots get fill_value = v (out of range).
    # Reads clip to a safe row (their values are never used); writes use
    # scatter mode="drop", so fill slots are DROPPED rather than clamped —
    # no duplicate-index write races with a real row's update.
    uids = jnp.unique(flat, size=flat.shape[0], fill_value=v)
    safe = jnp.clip(uids, 0, v - 1)

    count = state.count + 1
    tf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf

    # `uids` is sorted ascending with all-distinct entries (jnp.unique
    # output; fill_value = v sorts last) — tell XLA so the scatters take
    # the parallel no-duplicate path instead of the serialized
    # duplicate-safe one (measured 2x step regression at batch 262144
    # without the hints). `safe` is clip(uids): still sorted, but fill
    # slots collapse onto row v-1, so it is NOT unique — sorted hint only.
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
