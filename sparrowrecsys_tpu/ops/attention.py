"""DIN target attention (activation unit) — fused op.

Rebuild of the reference activation unit (`TFRecModel/.../DIN.py:144-163`):
given history embeddings H [B, T, D], candidate embedding c [B, D], compute
per-step features concat([H - c, H, c, H * c]) [B, T, 4D] -> Dense(32)
-> PReLU -> Dense(1, sigmoid) -> weights [B, T]; output = sum_t w_t * H_t.

`din_attention_xla` expresses this as batched matmuls (XLA fuses the
elementwise prologue into the first matmul). `din_attention_pallas` fuses
the whole unit — prologue, two matmuls, sigmoid, weighted pooling — into
one VMEM-resident kernel so H is read from HBM exactly once; for long
histories (T >= 64, SURVEY.md §5's history-length scaling note) this is
HBM-bound speed-of-light.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unit(h, c, w1, b1, alpha, w2, b2):
    """Shared math: h [*, T, D], c [*, D] broadcastable.

    The concat([h-c, h, c, h*c]) @ w1 of the reference graph folds
    algebraically — with w1 = [wa; wb; wc; wd] row blocks:
        feats @ w1 = [h, c, h*c] @ [(wa+wb); (wc-wa); wd]
    ONE K=3D matmul instead of the reference's K=4D (skips materializing
    h-c) and instead of round 1's THREE K=D matmuls: the MXU pads K to
    128 lanes, so at D=10 three separate matmuls each waste ~12x of the
    array — the single concat form measured +3.7% on the full DIN train
    step (tools/din_exp.py, v5e batch 65536: 7.73 vs 8.02 ms/step).
    Same numbers up to f32 reassociation (~1e-6)."""
    d = h.shape[-1]
    wa, wb, wc, wd = w1[:d], w1[d : 2 * d], w1[2 * d : 3 * d], w1[3 * d :]
    ce = jnp.broadcast_to(c[..., None, :], h.shape)
    feats = jnp.concatenate([h, ce, h * ce], axis=-1)        # [*, T, 3D]
    wk = jnp.concatenate([wa + wb, wc - wa, wd], axis=0)     # [3D, H]
    a = jnp.dot(feats, wk, preferred_element_type=jnp.float32) + b1
    a = jnp.where(a >= 0, a, alpha * a)  # PReLU
    logit = jnp.dot(a, w2, preferred_element_type=jnp.float32) + b2  # [*, T, 1]
    w = jax.nn.sigmoid(logit)
    mask = jnp.any(h != 0, axis=-1, keepdims=True)  # padded steps have zero emb
    w = w * mask
    return jnp.sum(w * h, axis=-2)  # [*, D]


def din_attention_xla(
    hist: jnp.ndarray,
    cand: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    alpha: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
) -> jnp.ndarray:
    return _unit(hist, cand, w1, b1, alpha, w2, b2)


def _din_kernel(h_ref, c_ref, w1_ref, b1_ref, a_ref, w2_ref, b2_ref, o_ref):
    o_ref[...] = _unit(
        h_ref[...], c_ref[...], w1_ref[...], b1_ref[...], a_ref[...],
        w2_ref[...], b2_ref[...],
    )


@functools.partial(jax.jit, static_argnames=("block_b",))
def din_attention_pallas(
    hist, cand, w1, b1, alpha, w2, b2, block_b: int = 0
):
    b, t, d = hist.shape
    h_dim = w1.shape[1]
    if block_b <= 0:
        # Size the batch block so live buffers (h, h*c, a, plus pipeline
        # double-buffering) stay well under the ~16 MB VMEM budget.
        per_row = t * (3 * d + 2 * h_dim) * 4  # bytes, rough upper bound
        block_b = 128
        while block_b > 8 and block_b * per_row * 2 > 6 * 1024 * 1024:
            block_b //= 2
    block_b = min(block_b, b)
    if b % block_b != 0:
        return din_attention_xla(hist, cand, w1, b1, alpha, w2, b2)
    grid = (b // block_b,)
    rep = lambda i: (0, 0)
    return pl.pallas_call(
        _din_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), hist.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(alpha.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, rep, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(hist, cand, w1, b1, alpha, w2, b2)


@jax.custom_vjp
def _din_attention_fused(hist, cand, w1, b1, alpha, w2, b2):
    return din_attention_pallas(hist, cand, w1, b1, alpha, w2, b2)


def _din_fused_fwd(hist, cand, w1, b1, alpha, w2, b2):
    # Residuals = raw inputs: the backward recomputes the (cheap, fused)
    # forward instead of storing activations — rematerialization.
    out = din_attention_pallas(hist, cand, w1, b1, alpha, w2, b2)
    return out, (hist, cand, w1, b1, alpha, w2, b2)


def _din_fused_bwd(res, g):
    _, vjp = jax.vjp(_unit, *res)
    return vjp(g)


_din_attention_fused.defvjp(_din_fused_fwd, _din_fused_bwd)


#: Forward-only dispatch threshold on B*T*D elements. Measured (tools/
#: kernel_bench.py, v5e, forced sync, round 5): standalone FORWARD at
#: the production DIN shape B=65536 T=64 D=128 (2^29 elements) the fused
#: kernel is 4.5x XLA (5.25 vs 23.49 ms — XLA re-reads the [B,T,D]
#: history from HBM per consumer; the kernel reads it once); ~1.04x at
#: 2^26; below that XLA's fusion wins (reference shapes: 0.6x at
#: 8192x5x10). bf16 inputs are cast to f32 for the kernel (measured:
#: XLA-bf16 16.2 ms still loses to cast+pallas-f32 5.25 ms).
PALLAS_MIN_ELEMENTS = 1 << 26


def din_attention(
    hist, cand, w1, b1, alpha, w2, b2, use_pallas: Optional[bool] = None
):
    """Auto-dispatching DIN activation unit. hist [B,T,D], cand [B,D] -> [B,D].

    Measured on TPU v5e with forced-sync timing (tools/kernel_bench.py ->
    KERNELS.md): XLA wins at reference/small shapes; the fused kernel's
    standalone FORWARD wins 4.5x at the production shape (B=65536 T=64
    D=128, round 5) — but the full TRAIN step with it measured 0.93x
    (202.8 vs 189.4 ms/step, tools/mfu_zoo.py): the custom VJP's
    backward recomputes the XLA formulation, which at this shape costs
    more than the forward win. Same fwd/bwd-pair lesson as fm_cross (r4)
    and r1. Default therefore stays XLA everywhere; `use_pallas=True`
    opts in for forward-only paths (inference/eval scoring at
    B*T*D >= PALLAS_MIN_ELEMENTS), where the 4.5x is real.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas and jax.default_backend() == "tpu":
        if hist.dtype != jnp.float32:
            hist = hist.astype(jnp.float32)
            cand = cand.astype(jnp.float32)
        return _din_attention_fused(hist, cand, w1, b1, alpha, w2, b2)
    return din_attention_xla(hist, cand, w1, b1, alpha, w2, b2)
