"""Component probe for the DIN T=64 history-backward lever.

The zoo-MFU table pinned DIN's production row at 2.4% MFU, bound by the
history backward: B*T = 4.2M per-contribution rows scatter-ADDED into
the 2^17-row movie table (~2.1 GB of row writes at the measured
~10 GB/s random-row wall). The contributions hit only <= 131k distinct
rows (mean multiplicity 32x), so pre-aggregating duplicates would cut
the random-write traffic 32x — IF the aggregation itself (sort +
permutation-gather + segment-sum) costs less than it saves. Each piece
rides a different measured rate (sort: VPU; permutation gather:
24-26 GB/s rows; sorted-scatter/segment-sum: the open question — does
SORTEDNESS rescue scatter-add bandwidth?), so this probe times them in
isolation at the exact shape before any custom VJP is written:

  scatter_dup : zeros.at[ids].add(rows) — the current backward primitive
  argsort     : jnp.argsort(ids) alone
  perm_gather : rows[perm] (random permutation row gather)
  segsum_sorted: segment_sum on pre-sorted contributions
  alt_full    : argsort + perm-gather + segment_sum (the whole pipeline)

    python tools/din_bwd_probe.py [--n-log2 22] [--vocab-log2 17] [--dim 128]
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

from sparrowrecsys_tpu.training.loop import hard_sync

STEPS = 4


def bench(fn, args, rounds: int = 3) -> float:
    out = fn(*args)
    hard_sync(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-log2", type=int, default=22,
                    help="log2 contributions (DIN MFU shape: B*T = 2^22)")
    ap.add_argument("--vocab-log2", type=int, default=17)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()
    only = set(args.variants.split(",")) if args.variants else None

    n, v, d = 1 << args.n_log2, 1 << args.vocab_log2, args.dim
    gb = n * d * 4 / 1e9
    print(f"backend: {jax.devices()[0].platform}  {n} contributions x "
          f"[{d}] f32 ({gb:.2f} GB) into [{v}, {d}]  x {STEPS} steps",
          flush=True)

    key = jax.random.PRNGKey(0)
    rows = jax.random.normal(key, (n, d), jnp.float32)
    ids = jax.random.randint(jax.random.fold_in(key, 1), (STEPS, n), 0, v,
                             dtype=jnp.int32)

    @jax.jit
    def scatter_dup(rows, ids):
        def body(c, step_ids):
            t = jnp.zeros((v, d), jnp.float32).at[step_ids].add(rows)
            return c + t[0, 0], jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    @jax.jit
    def argsort_only(rows, ids):
        def body(c, step_ids):
            perm = jnp.argsort(step_ids)
            return c + perm[0].astype(jnp.float32), jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    @jax.jit
    def perm_gather(rows, ids):
        def body(c, step_ids):
            perm = jnp.argsort(step_ids)
            g = rows[perm]
            return c + g[0, 0], jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    # Pre-sorted contributions: isolates the segment reduction itself.
    rows_sorted = rows
    ids_sorted = jnp.sort(ids, axis=1)

    @jax.jit
    def segsum_sorted(rows, ids):
        def body(c, step_ids):
            t = jnp.zeros((v, d), jnp.float32).at[step_ids].add(
                rows, indices_are_sorted=True
            )
            return c + t[0, 0], jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    @jax.jit
    def alt_full(rows, ids):
        def body(c, step_ids):
            perm = jnp.argsort(step_ids)
            t = jnp.zeros((v, d), jnp.float32).at[step_ids[perm]].add(
                rows[perm], indices_are_sorted=True
            )
            return c + t[0, 0], jnp.float32(0)
        c, _ = jax.lax.scan(body, jnp.float32(0), ids)
        return c

    variants = {
        "scatter_dup": lambda: bench(scatter_dup, (rows, ids), args.rounds),
        "argsort": lambda: bench(argsort_only, (rows, ids), args.rounds),
        "perm_gather": lambda: bench(perm_gather, (rows, ids), args.rounds),
        "segsum_sorted": lambda: bench(
            segsum_sorted, (rows_sorted, ids_sorted), args.rounds
        ),
        "alt_full": lambda: bench(alt_full, (rows, ids), args.rounds),
    }
    for k, run in variants.items():
        if only is not None and k not in only:
            continue
        try:
            ms = run()
            print(f"{k:<14} {ms:9.3f} ms/step  ({gb / ms * 1e3:.1f} GB/s "
                  f"of contributions)", flush=True)
        except Exception as e:
            print(f"{k:<14} ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
