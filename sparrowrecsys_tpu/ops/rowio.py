"""Row-granular embedding-table I/O as Pallas DMA pipelines.

Rebuilds nothing from the reference directly — this is the TPU-native
answer to the hot primitive under every large-table component the
reference delegates to parameter servers / Redis row ops
(`RecPySpark/.../Embedding.scala` user-embedding upserts,
`src/main/java/.../RedisClient.java` row writes): random row access
against a device-resident [V, D] table.

Built to challenge the measured random-row wall (round-4 probe: ~9 GB/s
effective scatter bandwidth, independent of row width, hints on) on the
hypothesis that XLA's (8, 128)-tile granularity amplified the traffic.
The challenge RAN and the hypothesis was REFUTED (v5e, KERNELS.md
round-5 rowio section): row-granular 512 B DMAs hit the same ~10 GB/s
write plateau at any pipeline depth (8/16/32) and any scalar-loop
unroll — the random-row WRITE path is bytes-bound at ~10 GB/s as a
platform property, measured from two independent engines. Reads are
not the wall at all: XLA's batched gather (24-26 GB/s of rows) beats
per-row DMAs at every depth.

What survives as shippable: `rows_write_pallas` is a measured 1.25-1.3x
win over XLA's scatter-set at the row-optimizer shape (3.35-3.53 vs
4.31-4.38 ms for 65536 x 512 B rows) — `TrainConfig.sparse_rowio` opts
the lazy-Adam write into it; XLA stays the default (the win does not
move the optimizer total, which is write-wall-bound either way).

Mosaic limits (recorded, they shape the API): a 1-row slice is only
supported for memrefs whose row is EXACTLY one 128-lane tile — wider
rows fail even chunked to (1, 128), narrower rows fail as sub-tile
slices — so these kernels serve [V, 128-wide] f32 tables and fall back
to XLA elsewhere; fori_loop lowering supports only unroll 1 or full
(the pipeline does manual partial unroll).

`rows_write` requires DISTINCT ids (the row-optimizer contract after its
unique step — training/row_optim.py makes them genuinely distinct); with
duplicates the last DMA wins nondeterministically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows DMAs kept in flight per grid program (rolling pipeline).
DMA_DEPTH = 8


def _rolling_pipeline(block, depth, unroll, start, wait):
    """DEPTH-deep rolling DMA pipeline over `block` rows with MANUAL
    partial unroll: Mosaic's fori_loop lowering only supports
    unroll=1 or full unroll, so the unroll factor becomes a static
    Python loop inside the body (amortizing the per-iteration scalar
    work — the suspected ~54 ns/row issue cost, pallas_rowio_probe)."""
    for j in range(min(depth, block)):      # static warmup
        start(j)
    n_un = unroll if (unroll > 0 and block % unroll == 0) else 1

    def body(it, c):
        j0 = it * n_un
        for k in range(n_un):               # static: unrolled in trace
            j = j0 + k
            wait(j)

            @pl.when(j + depth < block)
            def _():
                start(j + depth)

        return c

    jax.lax.fori_loop(0, block // n_un, body, 0)


def _gather_kernel(block: int, depth: int, unroll: int,
                   ids_ref, table_ref, out_ref, sems):
    base = pl.program_id(0) * block

    def dma(j):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + j]],
            out_ref.at[j],
            sems.at[j % depth],
        )

    _rolling_pipeline(block, depth, unroll,
                      lambda j: dma(j).start(), lambda j: dma(j).wait())


def _rowio_supported(d: int, dtype) -> bool:
    """Mosaic (this version, measured on v5e) only compiles a 1-row
    memref slice when the row is EXACTLY one f32 lane tile: [*, 128]
    f32. Wider rows fail even chunked to (1, 128); narrower rows fail
    as sub-tile slices; bf16 (a (16, 128) tile) is unmeasured on
    hardware and stays gated. Everything else falls back to XLA at the
    dispatch level — which is also the measured-right answer for
    gathers at any shape (KERNELS.md rowio section)."""
    return d == 128 and jnp.dtype(dtype) == jnp.float32


def rows_gather_pallas(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    block: int = 512,
    depth: int = DMA_DEPTH,
    unroll: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """table [V, D], ids [U] int32 in-range -> [U, D] = table[ids].

    One row-sized HBM->VMEM DMA per id, DEPTH in flight; non-[*, 128]
    f32 tables fall back to XLA (see _rowio_supported — and XLA's
    batched gather is the measured-faster choice anyway). Caller
    guarantees ids are in [0, V) — there is no OOV clamp at this level
    (ops/embedding.py's public lookups own masking semantics).
    """
    u = ids.shape[0]
    v, d = table.shape
    block = min(block, u)
    if u % block != 0 or not _rowio_supported(d, table.dtype):
        return jnp.take(table, ids, axis=0)
    grid = (u // block,)
    kernel = functools.partial(_gather_kernel, block, depth, unroll)
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


def _write_kernel(block: int, depth: int, v: int, unroll: int,
                  ids_ref, table_ref, rows_ref, out_ref, sems):
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
            rows_ref.at[j], out_ref.at[i], sems.at[j % depth]
        )

    def start(j):
        @pl.when(valid(j))
        def _():
            dma(j).start()

    def wait(j):
        @pl.when(valid(j))
        def _():
            dma(j).wait()

    _rolling_pipeline(block, depth, unroll, start, wait)


def rows_write_pallas(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    rows: jnp.ndarray,
    block: int = 512,
    depth: int = DMA_DEPTH,
    unroll: int = 8,
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
    if u % block != 0 or not _rowio_supported(d, table.dtype):
        return table.at[ids].set(
            rows, mode="drop", unique_indices=True
        )
    grid = (u // block,)
    kernel = functools.partial(_write_kernel, block, depth, v, unroll)
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
