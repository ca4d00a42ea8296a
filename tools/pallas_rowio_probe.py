"""Challenge the ~9 GB/s random-row wall with the Pallas row-DMA kernels.

The round-4/5 probes (tools/row_optim_probe.py, BASELINE.md) measured
XLA's row scatter at ~9 GB/s effective — independent of row width and
scatter-op count, with index hints on — and that wall owns the lazy-Adam
negative, deepfm's embedding-bound MFU, and DIN's T=64 row. The working
mechanism hypothesis: (8, 128)-tile granularity — each 512 B row write is
a 4 KB-tile read-modify-write (8x write amplification + a read), each row
read drags its tile.

ops/rowio.py moves exactly one row per DMA with a DEPTH-deep rolling
pipeline. This probe times it against the XLA ops at the row-optimizer
shape ([2^21 x 128] f32 table, 65536 distinct ids/step, 32-step scan per
dispatch, forced-sync best-of-3) and sweeps DMA depth + block to expose
which bound wins:

  - Pallas >> XLA        -> tile amplification confirmed; promote the
                            kernel into row_optim / embedding backward.
  - Pallas ~= XLA        -> the wall is DMA/descriptor issue rate or DRAM
                            row activation, not tiling; XLA already at it.
  - flat in depth        -> issue-rate-bound (sequential scalar core).
  - scales with depth    -> latency-bound; deeper pipelines pay off.

    python tools/pallas_rowio_probe.py [--vocab 21] [--batch 65536]
        [--dim 128] [--variants gather_xla,gather_pallas,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.ops.rowio import rows_gather_pallas, rows_write_pallas
from sparrowrecsys_tpu.training.loop import hard_sync
from sparrowrecsys_tpu.training.row_optim import (
    fused_row_adam_update,
    init_fused_row_adam,
)

STEPS = 32


def bench(fn, args, rounds: int = 3) -> float:
    out = fn(*args)
    hard_sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3  # ms/step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=21, help="log2 table rows")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--depths", default="4,8,16")
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()
    only = set(args.variants.split(",")) if args.variants else None
    depths = [int(x) for x in args.depths.split(",")]

    v, b, d = 1 << args.vocab, args.batch, args.dim
    row_mb = b * d * 4 / 1e6
    print(f"backend: {jax.devices()[0].platform}  table [{v}, {d}] f32  "
          f"{b} distinct ids/step x {STEPS} steps  ({row_mb:.0f} MB of rows)",
          flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (v, d), jnp.float32) * 0.05
    rows = jax.random.normal(jax.random.fold_in(key, 3), (b, d), jnp.float32)
    # Distinct in-range ids per step (rows_write contract), sorted like
    # the row-optimizer's unique output.
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.stack([
            np.sort(rng.choice(v, size=b, replace=False))
            for _ in range(STEPS)
        ]).astype(np.int32)
    )

    @jax.jit
    def gather_xla(table, ids):
        def body(c, step_ids):
            g = table.at[step_ids].get(indices_are_sorted=True)
            return c + g.sum(), jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    def make_gather_pallas(depth):
        @jax.jit
        def gather_pl(table, ids):
            def body(c, step_ids):
                g = rows_gather_pallas(table, step_ids, block=args.block,
                                       depth=depth)
                return c + g.sum(), jnp.float32(0)
            c, _ = jax.lax.scan(body, jnp.float32(0), ids)
            return c
        return gather_pl

    @jax.jit
    def write_xla(table, rows, ids):
        def body(t, step_ids):
            t = t.at[step_ids].set(rows, mode="drop", unique_indices=True,
                                   indices_are_sorted=True)
            return t, jnp.float32(0)
        t, _ = jax.lax.scan(body, table, ids)
        return t

    def make_write_pallas(depth):
        @jax.jit
        def write_pl(table, rows, ids):
            def body(t, step_ids):
                t = rows_write_pallas(t, step_ids, rows, block=args.block,
                                      depth=depth)
                return t, jnp.float32(0)
            t, _ = jax.lax.scan(body, table, ids)
            return t
        return write_pl

    def make_fused(rowio):
        @jax.jit
        def fused(state, grad, ids):
            def body(st, step_ids):
                st = fused_row_adam_update(st, grad, step_ids,
                                           learning_rate=1e-3, rowio=rowio)
                return st, jnp.float32(0)
            st, _ = jax.lax.scan(body, state, ids)
            return st
        return fused

    grad = jax.random.normal(jax.random.fold_in(key, 5), (v, d), jnp.float32)
    variants = {"gather_xla": lambda: bench(gather_xla, (table, ids),
                                            args.rounds),
                "write_xla": lambda: bench(write_xla, (table, rows, ids),
                                           args.rounds),
                "fused_adam_xla": lambda: bench(
                    make_fused(False),
                    (init_fused_row_adam(table), grad, ids), args.rounds),
                "fused_adam_rowio": lambda: bench(
                    make_fused(True),
                    (init_fused_row_adam(table), grad, ids), args.rounds)}
    for dep in depths:
        variants[f"gather_pallas_d{dep}"] = (
            lambda dep=dep: bench(make_gather_pallas(dep), (table, ids),
                                  args.rounds))
        variants[f"write_pallas_d{dep}"] = (
            lambda dep=dep: bench(make_write_pallas(dep), (table, rows, ids),
                                  args.rounds))

    for k, run in variants.items():
        if only is not None and k not in only:
            continue
        try:
            ms = run()
            print(f"{k:<18} {ms:8.3f} ms/step  "
                  f"({row_mb / ms:.1f} GB/s of rows)", flush=True)
        except Exception as e:
            print(f"{k:<18} ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
