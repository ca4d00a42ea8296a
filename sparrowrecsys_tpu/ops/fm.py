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


@functools.partial(jax.jit, static_argnames=("block_b",))
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


def fm_cross(fields: jnp.ndarray, use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """[B, F, D] -> [B, D]. Auto-selects implementation.

    Measured on TPU v5e with forced-sync timing (tools/kernel_bench.py ->
    KERNELS.md): XLA's fusion wins at training shapes; the Pallas tiling
    wins for very large serving batches (878 vs 1241 us at B=32768, F=16,
    D=128).
    """
    if use_pallas is None:
        b = fields.shape[0]
        use_pallas = b >= 32768
    if use_pallas and jax.default_backend() == "tpu":
        return fm_cross_pallas(fields)
    return fm_cross_xla(fields)
