"""Row-granular embedding-table I/O as Pallas DMA pipelines.

Rebuilds nothing from the reference directly — this is the TPU-native
answer to the hot primitive under every large-table component the
reference delegates to parameter servers / Redis row ops
(`RecPySpark/.../Embedding.scala` user-embedding upserts,
`src/main/java/.../RedisClient.java` row writes): random row access
against a device-resident [V, D] table.

Why a kernel can exist at all: XLA's gather/scatter on TPU operate at
(8, 128)-tile granularity — a 512 B f32 row READ drags its full 4 KB
tile through the pipeline, and a row WRITE is a read-modify-write of
that tile. The round-4 probe (tools/row_optim_probe.py, BASELINE.md)
measured the resulting wall: ~9 GB/s effective scatter bandwidth,
independent of row width (512 B vs 1536 B rows — same bytes/s), with
index hints on. ~8-16x of that gap is tile amplification, which a
row-granular DMA does not pay: `make_async_copy(table.at[id], out.at[j])`
moves exactly one row (one sublane), and a DEPTH-deep rolling pipeline
keeps that many row DMAs in flight to hide HBM latency.

The competing bound this kernel exposes instead: DMA-descriptor issue
rate — one descriptor per row, issued sequentially by the scalar core.
`tools/pallas_rowio_probe.py` measures which bound wins at the
row-optimizer shape; KERNELS.md records the verdict (the repo's
measure-before-default convention).

`rows_write` requires DISTINCT ids (the row-optimizer contract after its
unique step — training/row_optim.py makes them genuinely distinct); with
duplicates the last DMA wins nondeterministically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows DMAs kept in flight per grid program (rolling pipeline).
DMA_DEPTH = 8


def _gather_kernel(block: int, depth: int, ids_ref, table_ref, out_ref, sems):
    base = pl.program_id(0) * block

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + j]],
            out_ref.at[j],
            sems.at[jax.lax.rem(j, depth)],
        )

    def warm(j, c):
        dma(j).start()
        return c

    jax.lax.fori_loop(0, min(depth, block), warm, 0)

    def body(j, c):
        dma(j).wait()

        @pl.when(j + depth < block)
        def _():
            dma(j + depth).start()

        return c

    jax.lax.fori_loop(0, block, body, 0)


def rows_gather_pallas(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    block: int = 512,
    depth: int = DMA_DEPTH,
    interpret: bool = False,
) -> jnp.ndarray:
    """table [V, D], ids [U] int32 in-range -> [U, D] = table[ids].

    One row-sized HBM->VMEM DMA per id, DEPTH in flight. Caller
    guarantees ids are in [0, V) — there is no OOV clamp at this level
    (ops/embedding.py's public lookups own masking semantics).
    """
    u = ids.shape[0]
    v, d = table.shape
    block = min(block, u)
    if u % block != 0:
        return jnp.take(table, ids, axis=0)
    grid = (u // block,)
    kernel = functools.partial(_gather_kernel, block, depth)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (block, d), lambda i, ids: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        ),
        out_shape=jax.ShapeDtypeStruct((u, d), table.dtype),
        interpret=interpret,
    )(ids, table)


def _write_kernel(block: int, depth: int, v: int, ids_ref, table_ref,
                  rows_ref, out_ref, sems):
    base = pl.program_id(0) * block

    def valid(j):
        i = ids_ref[base + j]
        return (i >= 0) & (i < v)

    def dma(j):
        # Clamp inside the descriptor; the surrounding pl.when already
        # guarantees in-range — the clamp only keeps the traced address
        # computation well-defined on the skipped path.
        i = jnp.clip(ids_ref[base + j], 0, v - 1)
        return pltpu.make_async_copy(
            rows_ref.at[j],
            out_ref.at[i],
            sems.at[jax.lax.rem(j, depth)],
        )

    def maybe_start(j):
        @pl.when(valid(j))
        def _():
            dma(j).start()

    def warm(j, c):
        maybe_start(j)
        return c

    jax.lax.fori_loop(0, min(depth, block), warm, 0)

    def body(j, c):
        @pl.when(valid(j))
        def _():
            dma(j).wait()

        @pl.when(j + depth < block)
        def _():
            maybe_start(j + depth)

        return c

    jax.lax.fori_loop(0, block, body, 0)


def rows_write_pallas(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    rows: jnp.ndarray,
    block: int = 512,
    depth: int = DMA_DEPTH,
    interpret: bool = False,
) -> jnp.ndarray:
    """Functional row overwrite: table.at[ids].set(rows, mode="drop")
    with DISTINCT ids, as one row-sized VMEM->HBM DMA per id against the
    DONATED table buffer (input_output_aliases — no [V, D] copy).
    Out-of-range ids (including the row-optimizer's >= V drop slots) are
    skipped — XLA "drop" semantics.

    The aliasing means the input `table` value is consumed (standard
    jax donation semantics under jit).
    """
    u = ids.shape[0]
    v, d = table.shape
    block = min(block, u)
    if u % block != 0:
        return table.at[ids].set(
            rows, mode="drop", unique_indices=True
        )
    grid = (u // block,)
    kernel = functools.partial(_write_kernel, block, depth, v)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (block, d), lambda i, ids: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        ),
        out_shape=jax.ShapeDtypeStruct((v, d), table.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(ids, table, rows)
