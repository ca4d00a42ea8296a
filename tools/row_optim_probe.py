"""Attribute the lazy-Adam overhead measured at production shape.

BASELINE.md "Lazy Adam on TPU at production shape" records the negative:
row-sparse Adam is SLOWER than dense Adam even with 1.6% of rows touched
(2^22 x 128 table, batch 65536: 48.5 vs 43.9 ms/step), leaving ~20 ms of
sparse machinery unattributed. This probe times the candidate components
in isolation, each as a scan over STEPS iterations in ONE dispatch
(forced-sync protocol, best-of-N):

  noop       : scan overhead floor (carry the table through untouched)
  unique     : jnp.unique(ids, size=B) alone
  gather     : the 3 row gathers ([B] rows from table/mu/nu) + Adam math
  scatter    : the 3 row scatters back (hints on), on precomputed rows
  scatter1   : ONE [B, 3D] scatter into a fused [V, 3D] buffer (same
               bytes, 1/3 the scatter ops — the round-4 lever)
  sparse_all : full row_adam_update (= unique + gather + scatter)
  fused_all  : full fused_row_adam_update (one gather + one scatter on
               the fused buffer — what Trainer(sparse_tables=...) runs)
  dense      : optax-style dense Adam update of the same table (the
               moment-stream baseline the sparse path tries to beat)

If (sparse_all - unique - gather - scatter) >> noop, the interaction
(buffer copies forced by gather-then-scatter on the same carry array)
is the cost; if `scatter` alone dominates, the scatter op itself is the
cost; if `unique` dominates, the sort chain is.

    python tools/row_optim_probe.py [--vocab 22] [--batch 65536] [--dim 128]
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
from sparrowrecsys_tpu.training.row_optim import (
    RowAdamState,
    fused_row_adam_update,
    init_fused_row_adam,
    init_row_adam,
    row_adam_update,
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
    ap.add_argument("--vocab", type=int, default=22, help="log2 table rows")
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--only", default="",
                    help="comma list of variants to run (HBM control: the "
                    "full set holds both layouts and OOMs a 16 GB chip at "
                    "vocab 2^22)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    v, b, d = 1 << args.vocab, args.batch, args.dim
    print(f"backend: {jax.devices()[0].platform}  table [{v}, {d}]  "
          f"ids [{b}] x {STEPS} steps", flush=True)

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (v, d), jnp.float32) * 0.05
    grad = jax.random.normal(jax.random.fold_in(key, 1), (v, d), jnp.float32)
    # mu/nu (2x table bytes) only when a selected variant needs them —
    # at vocab 2^22 the full set plus the fused buf exceeds 16 GB HBM.
    need_state = only is None or bool(
        only & {"gather+math", "scatter", "sparse_all", "dense_adam"}
    )
    state = init_row_adam(table) if need_state else None
    ids = jax.random.randint(jax.random.fold_in(key, 2), (STEPS, b), 0, v,
                             dtype=jnp.int32)

    @jax.jit
    def noop(table, ids):
        def body(t, step_ids):
            return t + 0.0, jnp.float32(0)
        t, _ = jax.lax.scan(body, table, ids)
        return t

    @jax.jit
    def unique_only(table, ids):
        def body(t, step_ids):
            uids = jnp.unique(step_ids, size=step_ids.shape[0], fill_value=v)
            # touch t so the scan carries the table like the real path
            return t, uids.astype(jnp.float32).sum()
        t, s = jax.lax.scan(body, table, ids)
        return t, s

    @jax.jit
    def gather_math(table, mu, nu, grad, ids):
        def body(carry, step_ids):
            t, m, n = carry
            safe = jnp.sort(step_ids)  # sorted like the real path's uids
            g = grad.at[safe].get(indices_are_sorted=True)
            mr = m.at[safe].get(indices_are_sorted=True)
            nr = n.at[safe].get(indices_are_sorted=True)
            mu_new = 0.9 * mr + 0.1 * g
            nu_new = 0.999 * nr + 0.001 * (g * g)
            upd = -1e-3 * mu_new / (jnp.sqrt(nu_new) + 1e-7)
            return (t, m, n), upd.sum()
        (t, m, n), s = jax.lax.scan(body, (table, mu, nu), ids)
        return t, m, n, s

    @jax.jit
    def scatter_only(table, mu, nu, rows, ids):
        def body(carry, step_ids):
            t, m, n = carry
            uids = jnp.sort(step_ids)
            t = t.at[uids].add(rows, mode="drop", unique_indices=True,
                               indices_are_sorted=True)
            m = m.at[uids].set(rows, mode="drop", unique_indices=True,
                               indices_are_sorted=True)
            n = n.at[uids].set(rows, mode="drop", unique_indices=True,
                               indices_are_sorted=True)
            return (t, m, n), jnp.float32(0)
        (t, m, n), _ = jax.lax.scan(body, (table, mu, nu), ids)
        return t, m, n

    @jax.jit
    def scatter_one(buf, rows3, ids):
        def body(b, step_ids):
            uids = jnp.sort(step_ids)
            b = b.at[uids].set(rows3, mode="drop", unique_indices=True,
                               indices_are_sorted=True)
            return b, jnp.float32(0)
        b, _ = jax.lax.scan(body, buf, ids)
        return b

    @jax.jit
    def fused_all(state, grad, ids):
        def body(st, step_ids):
            st = fused_row_adam_update(st, grad, step_ids,
                                       learning_rate=1e-3)
            return st, jnp.float32(0)
        st, _ = jax.lax.scan(body, state, ids)
        return st

    @jax.jit
    def sparse_all(table, state, grad, ids):
        def body(carry, step_ids):
            t, st = carry
            t, st = row_adam_update(t, st, grad, step_ids,
                                    learning_rate=1e-3)
            return (t, st), jnp.float32(0)
        (t, st), _ = jax.lax.scan(body, (table, state), ids)
        return t, st

    @jax.jit
    def dense_adam(table, state, grad, ids):
        def body(carry, step_ids):
            t, st = carry
            count = st.count + 1
            mu = 0.9 * st.mu + 0.1 * grad
            nu = 0.999 * st.nu + 0.001 * (grad * grad)
            tf_ = count.astype(jnp.float32)
            upd = (-1e-3 * (mu / (1 - 0.9 ** tf_))
                   / (jnp.sqrt(nu / (1 - 0.999 ** tf_)) + 1e-7))
            return (t + upd, RowAdamState(count, mu, nu)), jnp.float32(0)
        (t, st), _ = jax.lax.scan(body, (table, state), ids)
        return t, st

    rows = jax.random.normal(jax.random.fold_in(key, 3), (b, d), jnp.float32)
    variants = {
        "noop": lambda: bench(noop, (table, ids), args.rounds),
        "unique": lambda: bench(unique_only, (table, ids), args.rounds),
        "gather+math": lambda: bench(
            gather_math, (table, state.mu, state.nu, grad, ids), args.rounds
        ),
        "scatter": lambda: bench(
            scatter_only, (table, state.mu, state.nu, rows, ids), args.rounds
        ),
        "scatter1": lambda: bench(
            scatter_one,
            (init_fused_row_adam(table).buf,
             jax.random.normal(jax.random.fold_in(key, 4), (b, 3 * d),
                               jnp.float32),
             ids),
            args.rounds,
        ),
        "sparse_all": lambda: bench(sparse_all, (table, state, grad, ids),
                                    args.rounds),
        "fused_all": lambda: bench(
            fused_all, (init_fused_row_adam(table), grad, ids), args.rounds
        ),
        "dense_adam": lambda: bench(dense_adam, (table, state, grad, ids),
                                    args.rounds),
    }
    results = {}
    for k, run in variants.items():
        if only is not None and k not in only:
            continue
        results[k] = run()
        print(f"{k:<12} {results[k]:8.3f} ms/step", flush=True)
    if {"sparse_all", "unique", "gather+math", "scatter", "noop"} <= set(
        results
    ):
        interaction = (results["sparse_all"] - results["unique"]
                       - results["gather+math"] - results["scatter"]
                       + 2 * results["noop"])
        print(f"interaction (sparse_all - parts): {interaction:+.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
