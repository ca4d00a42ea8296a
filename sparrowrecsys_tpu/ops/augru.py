"""GRU and attention-gated AUGRU recurrences as `lax.scan`.

Rebuild of DIEN's hand-rolled recurrent graph
(`TFRecModel/.../DIEN.py:181, 217-262`):
- `gru`: a standard Keras-style GRU over [B, T, D] returning all hidden
  states (reference uses `tf.keras.layers.GRU(EMBEDDING_SIZE,
  return_sequences=True)` at DIEN.py:181).
- `augru`: the reference's AUGRU cell, whose update gate is scaled by the
  per-step attention score: h <- (1 - a*r)*h + (a*r)*h_tilde, with
  r = sigmoid(W_r x + U_r h), z = sigmoid(W_z x + U_z h),
  h_tilde = tanh(W_h x + U_h (h*z)) — exactly DIEN.py:237-262's gate
  wiring (note the reference uses its "R" gate, not the conventional
  update gate, as the attention-scaled mixer; preserved).

The unrolled Python loop over `range(5)` in the reference becomes
`lax.scan` — one compiled step reused T times, so history length is a
config knob, not a recompile (SURVEY.md §5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GRUParams(NamedTuple):
    """Keras GRU parameter layout: kernel [D, 3H] (z|r|h), recurrent [H, 3H],
    bias [3H]."""

    kernel: jnp.ndarray
    recurrent: jnp.ndarray
    bias: jnp.ndarray


def gru(
    params: GRUParams, x: jnp.ndarray, mask: jnp.ndarray = None
) -> jnp.ndarray:
    """x [B, T, D] -> hidden states [B, T, H] (h0 = zeros).

    Keras GRU v2 gate math (reset_after=True is the Keras default, but the
    reference's recurrent bias is folded: we implement reset_after=False
    semantics, i.e. r applied before the recurrent matmul — the math DIEN's
    own AUGRU uses; the difference is a reparameterization invisible to AUC).

    mask [B, T] (optional): masked (False) timesteps carry the previous
    state through unchanged — Keras's mask_zero semantics (the reference's
    GRU honors the Embedding mask, DIEN.py:173-181).
    """
    h_dim = params.recurrent.shape[0]
    b = x.shape[0]

    # Hoist the input projection out of the recurrence: one [B*T, D] @
    # [D, 3H] MXU matmul instead of T narrow ones inside the scan
    # (cuDNN-style; with the AUGRU hoist + unroll, DIEN step 5.15 ->
    # 7.10M ex/s/chip, BASELINE.md).
    gates_x_all = x @ params.kernel + params.bias  # [B, T, 3H]

    def step(h, inp):
        gates_x, mt = inp
        xz, xr, xh = jnp.split(gates_x, 3, axis=-1)
        rz = h @ params.recurrent[:, : 2 * h_dim]
        hz, hr = jnp.split(rz, 2, axis=-1)
        z = jax.nn.sigmoid(xz + hz)
        r = jax.nn.sigmoid(xr + hr)
        hh = jnp.tanh(xh + (r * h) @ params.recurrent[:, 2 * h_dim :])
        h_new = z * h + (1.0 - z) * hh
        h_new = jnp.where(mt[:, None], h_new, h)
        return h_new, h_new

    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    h0 = jnp.zeros((b, h_dim), x.dtype)
    t = x.shape[1]
    _, hs = jax.lax.scan(
        step,
        h0,
        (jnp.swapaxes(gates_x_all, 0, 1), jnp.swapaxes(mask, 0, 1)),
        unroll=min(t, 8),
    )
    return jnp.swapaxes(hs, 0, 1)


class AUGRUGate(NamedTuple):
    """One `GRU_gate_parameter` (DIEN.py:217-233): y = act(W x + b + U h)."""

    w: jnp.ndarray  # [D, H]
    b: jnp.ndarray  # [H]
    u: jnp.ndarray  # [H, H] (no bias, DIEN.py:228)


class AUGRUParams(NamedTuple):
    r: AUGRUGate
    z: AUGRUGate
    h: AUGRUGate


def augru(
    params: AUGRUParams, states: jnp.ndarray, attention: jnp.ndarray
) -> jnp.ndarray:
    """states [B, T, H] (GRU hidden states), attention [B, T, H] -> [B, H].

    Reference update (DIEN.py:254-260), h0 = zeros (the reference draws a
    fresh GlorotUniform h0 inside call() each batch — a bug we fix
    deliberately; zeros is the conventional choice and AUC-equivalent).
    """

    b, t, hdim = states.shape
    # Hoist the three input projections out of the recurrence AS ONE
    # matmul: the MXU pads K to 128 lanes, so at H=10 separate per-gate
    # matmuls each waste ~12x of the array — fold to [B, T, H] @ [H, 3H]
    # (same lesson as the DIN attention refold, tools/din_exp.py). Inside
    # the scan the r/z recurrent matmuls merge the same way; h_tilde's
    # stays separate (it consumes h*z, not h). Identical per-element
    # reductions — same numbers.
    wx = jnp.concatenate([params.r.w, params.z.w, params.h.w], axis=1)
    bx = jnp.concatenate([params.r.b, params.z.b, params.h.b])
    x_all = states @ wx + bx                       # [B, T, 3H]
    u_rz = jnp.concatenate([params.r.u, params.z.u], axis=1)  # [H, 2H]

    def step(h, inp):
        x, at = inp
        xr, xz, xh = jnp.split(x, 3, axis=-1)
        rz = h @ u_rz
        r = jax.nn.sigmoid(xr + rz[:, :hdim])
        z = jax.nn.sigmoid(xz + rz[:, hdim:])
        h_tilde = jnp.tanh(xh + (h * z) @ params.h.u)
        a = at * r
        h_new = (1.0 - a) * h + a * h_tilde
        return h_new, None

    h0 = jnp.zeros((b, hdim), states.dtype)
    h_fin, _ = jax.lax.scan(
        step,
        h0,
        tuple(jnp.swapaxes(v, 0, 1) for v in (x_all, attention)),
        unroll=min(t, 8),
    )
    return h_fin
