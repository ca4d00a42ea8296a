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

Custom VJP (round 3, measured a WASH — ships opt-in): the hand-written
VJPs below keep only the unavoidable dh-propagation matmuls in the
backward scan, stack the per-step pre-activation cotangents, and compute
every weight gradient OUTSIDE the scan as ONE flattened
[T*B, H]-by-[T*B, ·] matmul. The structural decomposition that motivated
them was refuted by measurement (tools/dien_decomp2.py, v5e batch 65536):
both recurrences together cost only 0.66 ms of DIEN's ~10 ms step (the
aux block costs 2.09 ms), and the custom backward is a wash vs `lax.scan`
autodiff (10.03 vs 9.70 ms/step, 0.967x, tools/dien_vjp_exp.py) — XLA
already overlaps the in-scan dW matmuls with the dh chain. Numerics:
identical per-element math; weight grads differ from autodiff only by f32
sum reassociation (asserted to rtol 1e-5 in tests/test_ops.py).
`custom_vjp` therefore defaults False everywhere (ops AND
`DIEN.recurrence_custom_vjp`) — one default authority, plain `lax.scan`
autodiff; the custom path stays tested for revisit at much larger H/T.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _float0_like(x):
    """Zero cotangent for a non-differentiable (bool/int) primal input."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


class GRUParams(NamedTuple):
    """Keras GRU parameter layout: kernel [D, 3H] (z|r|h), recurrent [H, 3H],
    bias [3H]."""

    kernel: jnp.ndarray
    recurrent: jnp.ndarray
    bias: jnp.ndarray


def _gru_scan_fwd_core(recurrent, gx, mask, h0):
    """Time-major GRU recurrence. gx [T, B, 3H] (input projections already
    applied), mask [T, B] bool, h0 [B, H] -> (hs, z, r, hh) all [T, B, H]."""
    h_dim = h0.shape[-1]

    def step(h, inp):
        gates_x, mt = inp
        xz, xr, xh = jnp.split(gates_x, 3, axis=-1)
        rz = h @ recurrent[:, : 2 * h_dim]
        z = jax.nn.sigmoid(xz + rz[:, :h_dim])
        r = jax.nn.sigmoid(xr + rz[:, h_dim:])
        hh = jnp.tanh(xh + (r * h) @ recurrent[:, 2 * h_dim :])
        h_upd = z * h + (1.0 - z) * hh
        h_new = jnp.where(mt[:, None], h_upd, h)
        return h_new, (h_new, z, r, hh)

    t = gx.shape[0]
    _, outs = jax.lax.scan(step, h0, (gx, mask), unroll=min(t, 8))
    return outs


def _gru_scan(recurrent, gx, mask, h0):
    hs, _, _, _ = _gru_scan_fwd_core(recurrent, gx, mask, h0)
    return hs


def _gru_scan_remat(recurrent, gx, mask, h0):
    """GRU recurrence with a rematerialized scan body: backward recomputes
    the gate activations per step from (h_prev, gx_t) instead of saving
    z/r/hh stacked over T. Trades 3 [T, B, H] residual stacks (~1.5 GB at
    DIEN's batch-16384 T=64 dim-128 production shape) for one extra gate
    evaluation per backward step — the scan-rematerialization knob for
    long-T big-batch compiles that otherwise OOM HBM (BASELINE.md
    zoo-MFU reading 4)."""
    h_dim = h0.shape[-1]

    @jax.checkpoint
    def step(h, inp):
        gates_x, mt = inp
        xz, xr, xh = jnp.split(gates_x, 3, axis=-1)
        rz = h @ recurrent[:, : 2 * h_dim]
        z = jax.nn.sigmoid(xz + rz[:, :h_dim])
        r = jax.nn.sigmoid(xr + rz[:, h_dim:])
        hh = jnp.tanh(xh + (r * h) @ recurrent[:, 2 * h_dim :])
        h_new = jnp.where(mt[:, None], z * h + (1.0 - z) * hh, h)
        return h_new, h_new

    t = gx.shape[0]
    _, hs = jax.lax.scan(step, h0, (gx, mask), unroll=min(t, 8))
    return hs


_gru_scan_vjp = jax.custom_vjp(_gru_scan)


def _gru_scan_fwd(recurrent, gx, mask, h0):
    hs, z, r, hh = _gru_scan_fwd_core(recurrent, gx, mask, h0)
    return hs, (recurrent, mask, h0, hs, z, r, hh)


def _gru_scan_bwd(res, dhs):
    recurrent, mask, h0, hs, z, r, hh = res
    h_dim = h0.shape[-1]
    t = hs.shape[0]
    u_zr = recurrent[:, : 2 * h_dim]
    u_h = recurrent[:, 2 * h_dim :]
    h_prevs = jnp.concatenate([h0[None], hs[:-1]], axis=0)  # [T, B, H]

    def step(dh_carry, inp):
        dh_out, mt, hp, zt, rt, hht = inp
        dh = dh_carry + dh_out
        m = mt[:, None]
        dh_upd = jnp.where(m, dh, 0.0)
        dh_prev = jnp.where(m, 0.0, dh)
        # h_upd = z*h + (1-z)*hh
        dz = dh_upd * (hp - hht)
        dhh = dh_upd * (1.0 - zt)
        dh_prev = dh_prev + dh_upd * zt
        # hh = tanh(xh + (r*h) @ u_h)
        d_pre_h = dhh * (1.0 - hht * hht)
        d_rh = d_pre_h @ u_h.T
        dr = d_rh * hp
        dh_prev = dh_prev + d_rh * rt
        # z/r sigmoids share one recurrent matmul: [dz|dr] @ u_zr.T
        d_pre_z = dz * zt * (1.0 - zt)
        d_pre_r = dr * rt * (1.0 - rt)
        d_pre_zr = jnp.concatenate([d_pre_z, d_pre_r], axis=-1)
        dh_prev = dh_prev + d_pre_zr @ u_zr.T
        return dh_prev, (d_pre_zr, d_pre_h)

    dh0, (d_pre_zr_s, d_pre_h_s) = jax.lax.scan(
        step,
        jnp.zeros_like(h0),
        (dhs, mask, h_prevs, z, r, hh),
        reverse=True,
        unroll=min(t, 8),
    )
    # Weight grads as ONE flattened matmul each (the round-3 lever).
    tb = t * hs.shape[1]
    hp_flat = h_prevs.reshape(tb, h_dim)
    du_zr = hp_flat.T @ d_pre_zr_s.reshape(tb, 2 * h_dim)
    rh_flat = (r * h_prevs).reshape(tb, h_dim)
    du_h = rh_flat.T @ d_pre_h_s.reshape(tb, h_dim)
    d_recurrent = jnp.concatenate([du_zr, du_h], axis=1)
    dgx = jnp.concatenate(
        [d_pre_zr_s[..., :h_dim], d_pre_zr_s[..., h_dim:], d_pre_h_s], axis=-1
    )
    return d_recurrent, dgx, _float0_like(res[1]), dh0


_gru_scan_vjp.defvjp(_gru_scan_fwd, _gru_scan_bwd)


def gru(
    params: GRUParams,
    x: jnp.ndarray,
    mask: jnp.ndarray = None,
    custom_vjp: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """x [B, T, D] -> hidden states [B, T, H] (h0 = zeros).

    Keras GRU v2 gate math (reset_after=True is the Keras default, but the
    reference's recurrent bias is folded: we implement reset_after=False
    semantics, i.e. r applied before the recurrent matmul — the math DIEN's
    own AUGRU uses; the difference is a reparameterization invisible to AUC).

    mask [B, T] (optional): masked (False) timesteps carry the previous
    state through unchanged — Keras's mask_zero semantics (the reference's
    GRU honors the Embedding mask, DIEN.py:173-181).

    custom_vjp=True routes the recurrence through the hand-written backward
    (weight grads as one stacked matmul) — measured a wash vs autodiff at
    the bench config, so False is the default; see module docstring.

    remat=True rematerializes the scan body in the backward pass (drops
    the per-step gate-activation stacks; one extra gate evaluation per
    backward step) — the memory knob for long-T big-batch training.
    Mutually exclusive with custom_vjp (which manages its own residuals).
    """
    h_dim = params.recurrent.shape[0]
    b = x.shape[0]

    # Hoist the input projection out of the recurrence: one [B*T, D] @
    # [D, 3H] MXU matmul instead of T narrow ones inside the scan
    # (cuDNN-style; with the AUGRU hoist + unroll, DIEN step 5.15 ->
    # 7.10M ex/s/chip, BASELINE.md). Autodiff of THIS line already yields
    # the kernel/bias grads as single stacked matmuls.
    gates_x_all = x @ params.kernel + params.bias  # [B, T, 3H]

    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)
    # Carry dtype follows the PROJECTED gates, not the raw input: with a
    # bf16 table lookup (models' lookup_dtype) x is bf16 but the matmul
    # promotes to f32 — an x-dtype h0 would make the scan carry change
    # dtype across steps (scan error). State feedback stays fp32.
    h0 = jnp.zeros((b, h_dim), gates_x_all.dtype)
    if custom_vjp and remat:
        raise ValueError("gru: custom_vjp and remat are mutually exclusive")
    fn = (
        _gru_scan_vjp
        if custom_vjp
        else (_gru_scan_remat if remat else _gru_scan)
    )
    hs = fn(
        params.recurrent,
        jnp.swapaxes(gates_x_all, 0, 1),
        jnp.swapaxes(mask, 0, 1),
        h0,
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


def _augru_scan_fwd_core(u_rz, u_h, x_all, att, h0):
    """Time-major AUGRU. x_all [T, B, 3H] (r|z|h input projections applied),
    att [T, B, H], h0 [B, H] -> (h_fin, h_prevs, r, z, h_tilde)."""
    hdim = h0.shape[-1]

    def step(h, inp):
        x, at = inp
        xr, xz, xh = jnp.split(x, 3, axis=-1)
        rz = h @ u_rz
        r = jax.nn.sigmoid(xr + rz[:, :hdim])
        z = jax.nn.sigmoid(xz + rz[:, hdim:])
        h_tilde = jnp.tanh(xh + (h * z) @ u_h)
        a = at * r
        h_new = (1.0 - a) * h + a * h_tilde
        return h_new, (h, r, z, h_tilde)

    t = x_all.shape[0]
    h_fin, outs = jax.lax.scan(step, h0, (x_all, att), unroll=min(t, 8))
    return h_fin, outs


def _augru_scan(u_rz, u_h, x_all, att, h0):
    h_fin, _ = _augru_scan_fwd_core(u_rz, u_h, x_all, att, h0)
    return h_fin


def _augru_scan_remat(u_rz, u_h, x_all, att, h0):
    """AUGRU recurrence with a rematerialized scan body (see
    `_gru_scan_remat`): drops the r/z/h_tilde residual stacks; the carry
    chain h_prevs is the only [T, B, H] the backward keeps."""

    @jax.checkpoint
    def step(h, inp):
        x, at = inp
        hdim = h.shape[-1]
        xr, xz, xh = jnp.split(x, 3, axis=-1)
        rz = h @ u_rz
        r = jax.nn.sigmoid(xr + rz[:, :hdim])
        z = jax.nn.sigmoid(xz + rz[:, hdim:])
        h_tilde = jnp.tanh(xh + (h * z) @ u_h)
        a = at * r
        return (1.0 - a) * h + a * h_tilde, None

    t = x_all.shape[0]
    h_fin, _ = jax.lax.scan(step, h0, (x_all, att), unroll=min(t, 8))
    return h_fin


_augru_scan_vjp = jax.custom_vjp(_augru_scan)


def _augru_scan_fwd(u_rz, u_h, x_all, att, h0):
    h_fin, (h_prevs, r, z, h_tilde) = _augru_scan_fwd_core(
        u_rz, u_h, x_all, att, h0
    )
    return h_fin, (u_rz, u_h, att, h_prevs, r, z, h_tilde)


def _augru_scan_bwd(res, dh_fin):
    u_rz, u_h, att, h_prevs, r, z, h_tilde = res
    hdim = h_prevs.shape[-1]
    t = h_prevs.shape[0]

    def step(dh, inp):
        at, hp, rt, zt, ht = inp
        a = at * rt
        # h_new = (1-a)*h + a*h_tilde
        da = dh * (ht - hp)
        dh_tilde = dh * a
        dh_prev = dh * (1.0 - a)
        dat = da * rt
        dr = da * at
        # h_tilde = tanh(xh + (h*z) @ u_h)
        d_pre_h = dh_tilde * (1.0 - ht * ht)
        d_hz = d_pre_h @ u_h.T
        dz = d_hz * hp
        dh_prev = dh_prev + d_hz * zt
        # r/z sigmoids share one recurrent matmul: [dr|dz] @ u_rz.T
        d_pre_r = dr * rt * (1.0 - rt)
        d_pre_z = dz * zt * (1.0 - zt)
        d_pre_rz = jnp.concatenate([d_pre_r, d_pre_z], axis=-1)
        dh_prev = dh_prev + d_pre_rz @ u_rz.T
        return dh_prev, (d_pre_rz, d_pre_h, dat)

    dh0, (d_pre_rz_s, d_pre_h_s, datt) = jax.lax.scan(
        step,
        dh_fin,
        (att, h_prevs, r, z, h_tilde),
        reverse=True,
        unroll=min(t, 8),
    )
    tb = t * h_prevs.shape[1]
    hp_flat = h_prevs.reshape(tb, hdim)
    du_rz = hp_flat.T @ d_pre_rz_s.reshape(tb, 2 * hdim)
    hz_flat = (h_prevs * z).reshape(tb, hdim)
    du_h = hz_flat.T @ d_pre_h_s.reshape(tb, hdim)
    dx_all = jnp.concatenate(
        [d_pre_rz_s[..., :hdim], d_pre_rz_s[..., hdim:], d_pre_h_s], axis=-1
    )
    return du_rz, du_h, dx_all, datt, dh0


_augru_scan_vjp.defvjp(_augru_scan_fwd, _augru_scan_bwd)


def augru(
    params: AUGRUParams,
    states: jnp.ndarray,
    attention: jnp.ndarray,
    custom_vjp: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """states [B, T, H] (GRU hidden states), attention [B, T, H] -> [B, H].

    Reference update (DIEN.py:254-260), h0 = zeros (the reference draws a
    fresh GlorotUniform h0 inside call() each batch — a bug we fix
    deliberately; zeros is the conventional choice and AUC-equivalent).

    custom_vjp=True routes the recurrence through the hand-written backward
    (weight grads as one stacked matmul) — measured a wash vs autodiff at
    the bench config, so False is the default; see module docstring.
    """

    b, t, hdim = states.shape
    # Hoist the three input projections out of the recurrence AS ONE
    # matmul: the MXU pads K to 128 lanes, so at H=10 separate per-gate
    # matmuls each waste ~12x of the array — fold to [B, T, H] @ [H, 3H]
    # (same lesson as the DIN attention refold, tools/din_exp.py). Inside
    # the scan the r/z recurrent matmuls merge the same way; h_tilde's
    # stays separate (it consumes h*z, not h). Identical per-element
    # reductions — same numbers. Autodiff of this line yields the W/b
    # grads as single stacked matmuls.
    wx = jnp.concatenate([params.r.w, params.z.w, params.h.w], axis=1)
    bx = jnp.concatenate([params.r.b, params.z.b, params.h.b])
    x_all = states @ wx + bx                       # [B, T, 3H]
    u_rz = jnp.concatenate([params.r.u, params.z.u], axis=1)  # [H, 2H]

    h0 = jnp.zeros((b, hdim), states.dtype)
    if custom_vjp and remat:
        raise ValueError("augru: custom_vjp and remat are mutually exclusive")
    fn = (
        _augru_scan_vjp
        if custom_vjp
        else (_augru_scan_remat if remat else _augru_scan)
    )
    return fn(
        u_rz,
        params.h.u,
        jnp.swapaxes(x_all, 0, 1),
        jnp.swapaxes(attention, 0, 1),
        h0,
    )
