"""FM second-order interaction: sum-square minus square-sum.

Rebuild of the reference's `ReduceLayer`-based graph
(`TFRecModel/.../DeepFM_v2.py:131-154`): for stacked field embeddings
x [B, F, D], computes (sum_f x)^2 - sum_f x^2 -> [B, D]. (The reference
omits the usual 0.5 factor — kept identical.)

Two implementations:
- `fm_cross_xla`: the jnp expression — XLA fuses it into two fused
  reductions; optimal for small F*D.
- `fm_cross_pallas`: a Pallas kernel tiling the batch through VMEM —
  used when B is large enough that explicit blocking beats the fusion
  (benchmarked in bench.py, auto-selected by `fm_cross`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fm_cross_xla(fields: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sum(fields, axis=1)
    sq = jnp.sum(fields * fields, axis=1)
    return s * s - sq


def _fm_kernel(x_ref, o_ref):
    x = x_ref[...]  # [TB, F, D]
    s = jnp.sum(x, axis=1)
    sq = jnp.sum(x * x, axis=1)
    o_ref[...] = s * s - sq


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fm_cross_pallas(fields: jnp.ndarray, block_b: int = 256) -> jnp.ndarray:
    b, f, d = fields.shape
    block_b = min(block_b, b)
    if b % block_b != 0:
        return fm_cross_xla(fields)
    grid = (b // block_b,)
    return pl.pallas_call(
        _fm_kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), fields.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, f, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(fields)


def _fm_pallas_fwd(fields, block_b):
    return fm_cross_pallas(fields, block_b), fields


def fm_cross_bwd(fields: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """d/dx_f (s^2 - sum x^2) = 2(s - x_f); one fused XLA expression —
    the backward is pure bandwidth, nothing for a kernel to win."""
    s = jnp.sum(fields, axis=1)
    return 2.0 * g[:, None, :] * (s[:, None, :] - fields)


def _fm_pallas_bwd(block_b, fields, g):
    return (fm_cross_bwd(fields, g),)


# Without this, training any model through the Pallas path fails at
# linearization (Pallas kernels have no automatic transpose rule) — hit
# by DeepFMv2 at batch >= 32768 (tools/zoo_bench.py).
fm_cross_pallas.defvjp(_fm_pallas_fwd, _fm_pallas_bwd)


def fm_cross(fields: jnp.ndarray, use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """[B, F, D] -> [B, D]. XLA by default; Pallas opt-in.

    Measured on TPU v5e with forced-sync timing: standalone FORWARD the
    Pallas tiling wins large batches (878 vs 1241 us at B=32768, F=16,
    D=128 — tools/kernel_bench.py -> KERNELS.md), but inside the full
    DeepFMv2 train step the B>=32768 Pallas dispatch is a 27% REGRESSION
    (6.02 vs 8.23M ex/s at batch 65536, tools/zoo_bench.py + the forced-
    XLA A/B) — the fwd/bwd pair schedules worse than XLA's fusion.
    Re-decided WITH data at the round-5 production shape (KERNELS.md,
    B=262144 F=5 D=128): XLA wins the forward outright there too
    (3.38 vs 4.95 ms f32, 1.74 vs 3.96 ms bf16 — at F=5 the sum-sq
    identity is one fused pass for XLA; the kernel's tiling only paid at
    F>=16 mid shapes). XLA stays the default; `use_pallas=True` remains
    for forward-only scans at mid F*D. Contrast DIN attention, whose
    dispatch DID flip at production shape (ops/attention.py
    PALLAS_MIN_ELEMENTS, 4.5x).
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas and jax.default_backend() == "tpu":
        return fm_cross_pallas(fields)
    return fm_cross_xla(fields)
