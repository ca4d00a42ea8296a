"""Embedding-gradient backward strategy microbench on real TPU.

Round-1 decomposition (BASELINE.md "optimization roadmap"): the DeepFM full
train step pays ~0.2 ms per embedding-table scatter-add per step, a fixed
per-op cost independent of table size; the V<=2048 tables were fixed with a
one-hot-matmul VJP, but the 30001-row user table still pays the scatter.
This bench compares big-table backward strategies under the trainer's real
schedule (a lax.scan over K steps, one dispatch), forced-sync timing:

  scatter          .at[ids].add(g)                       (XLA default VJP)
  scatter_sorted   sort ids, then .at[].add(indices_are_sorted=True)
  unique_scatter   sort + run-boundary cumsum dedup -> one scatter with
                   unique_indices=True (duplicates dropped out-of-range)
  onehot           [B, V] one-hot matmul (known to regress at V=30001)
  combined         DeepFM's 7 tables as ONE concatenated [sum V, D] table:
                   one scatter (or unique_scatter) instead of 7

    python tools/grad_bench.py            # prints a table
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, D, K = 8192, 10, 64
V_BIG = 30001


from sparrowrecsys_tpu.training.loop import hard_sync as _sync  # noqa: E402


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


# --- backward strategies, as custom-VJP gathers --------------------------


def make_gather(bwd_kind: str):
    @jax.custom_vjp
    def gather(table, ids):
        return jnp.take(table, ids, axis=0)

    def fwd(table, ids):
        return jnp.take(table, ids, axis=0), (ids, table.shape[0])

    def bwd(res, g):
        ids, v = res
        flat_ids = ids.reshape(-1)
        flat_g = g.reshape(len(flat_ids), -1)
        if bwd_kind == "scatter":
            gt = jnp.zeros((v, flat_g.shape[1]), flat_g.dtype).at[flat_ids].add(flat_g)
        elif bwd_kind == "scatter_sorted":
            order = jnp.argsort(flat_ids)
            s_ids = flat_ids[order]
            s_g = flat_g[order]
            gt = (
                jnp.zeros((v, flat_g.shape[1]), flat_g.dtype)
                .at[s_ids]
                .add(s_g, indices_are_sorted=True)
            )
        elif bwd_kind == "unique_scatter":
            order = jnp.argsort(flat_ids)
            s_ids = flat_ids[order]
            s_g = flat_g[order]
            csum = jnp.cumsum(s_g, axis=0)
            is_last = jnp.concatenate(
                [s_ids[1:] != s_ids[:-1], jnp.ones((1,), bool)]
            )
            # run-sum ending at i = csum[i] - csum[last index of previous run]
            prev_last = jnp.cumsum(is_last) - 1  # run ordinal per position
            # csum at previous run's last position, 0 for the first run:
            last_pos = jnp.nonzero(is_last, size=len(s_ids), fill_value=len(s_ids) - 1)[0]
            prev_csum = jnp.where(
                (prev_last > 0)[:, None],
                jnp.take(csum, last_pos[jnp.maximum(prev_last - 1, 0)], axis=0),
                0.0,
            )
            run_sum = csum - prev_csum
            # scatter only run-last positions; others dropped out-of-range
            tgt = jnp.where(is_last, s_ids, v)
            gt = (
                jnp.zeros((v, flat_g.shape[1]), flat_g.dtype)
                .at[tgt]
                .add(run_sum, mode="drop", indices_are_sorted=True, unique_indices=True)
            )
        elif bwd_kind == "onehot":
            oh = jax.nn.one_hot(flat_ids, v, dtype=flat_g.dtype)
            gt = jnp.dot(oh.T, flat_g, preferred_element_type=jnp.float32)
        else:
            raise ValueError(bwd_kind)
        return gt, None

    gather.defvjp(fwd, bwd)
    return gather


def correctness_check():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50, size=(256,)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(256, 4)), jnp.float32)
    g_ref = None
    for kind in ("scatter", "scatter_sorted", "unique_scatter", "onehot"):
        gather = make_gather(kind)

        def loss(t):
            return jnp.sum((gather(t, ids) - tgt) ** 2)

        g = jax.grad(loss)(table)
        if g_ref is None:
            g_ref = g
        else:
            # relative: TPU matmuls (onehot path) run bf16 on the MXU
            err = float(jnp.max(jnp.abs(g - g_ref)) / (jnp.max(jnp.abs(g_ref)) + 1e-9))
            assert err < 1e-2, (kind, err)
    print("correctness: all strategies match scatter grad")


def bench_single_table(rows):
    rng = np.random.default_rng(0)
    # Zipf-ish ids: realistic duplicate structure of user ids in a batch
    ids = jnp.asarray(rng.integers(0, V_BIG, size=(K, B)), jnp.int32)
    tgt = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    for kind in ("scatter", "scatter_sorted", "unique_scatter", "onehot"):
        gather = make_gather(kind)

        @jax.jit
        def epoch(table, ids=ids, gather=gather):
            def step(t, i):
                def loss(t):
                    return jnp.sum((gather(t, i) - tgt) ** 2)

                g = jax.grad(loss)(t)
                return t - 1e-3 * g, ()

            t, _ = jax.lax.scan(step, table, ids)
            return t

        table = jnp.asarray(rng.normal(size=(V_BIG, D)).astype(np.float32))
        dt = timeit(epoch, table)
        rows.append((f"single[{kind}]", f"V={V_BIG}", dt / K * 1e3))


def bench_combined(rows):
    """7-table DeepFM-ish step: separate lookups/scatters vs one combined."""
    rng = np.random.default_rng(0)
    vocabs = [V_BIG, 1001, 19, 19, 19, 19, 19]
    ids_sep = [
        jnp.asarray(rng.integers(0, v, size=(K, B)), jnp.int32) for v in vocabs
    ]
    tgt = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    offsets = np.concatenate([[0], np.cumsum(vocabs)[:-1]])
    v_tot = int(np.sum(vocabs))
    ids_comb = jnp.stack(
        [i + int(o) for i, o in zip(ids_sep, offsets)], axis=-1
    )  # [K, B, 7]

    # separate tables, default scatter backward per table
    @jax.jit
    def epoch_sep(tables):
        def step(ts, i_all):
            def loss(ts):
                s = 0.0
                for t, i in zip(ts, i_all):
                    s = s + jnp.sum((jnp.take(t, i, axis=0) - tgt) ** 2)
                return s

            gs = jax.grad(loss)(ts)
            return [t - 1e-3 * g for t, g in zip(ts, gs)], ()

        ts, _ = jax.lax.scan(step, tables, ids_sep)
        return ts

    tables = [
        jnp.asarray(rng.normal(size=(v, D)).astype(np.float32)) for v in vocabs
    ]
    dt = timeit(epoch_sep, tables)
    rows.append(("7tab[sep scatter]", f"Vsum={v_tot}", dt / K * 1e3))

    for kind in ("scatter", "unique_scatter"):
        gather = make_gather(kind)

        @jax.jit
        def epoch_comb(table, gather=gather):
            def step(t, i_flat):
                def loss(t):
                    e = gather(t, i_flat.reshape(-1))  # [B*7, D]
                    e = e.reshape(B, len(vocabs), D).sum(1)
                    return jnp.sum((e - tgt) ** 2)

                g = jax.grad(loss)(t)
                return t - 1e-3 * g, ()

            t, _ = jax.lax.scan(step, table, ids_comb)
            return t

        table = jnp.asarray(rng.normal(size=(v_tot, D)).astype(np.float32))
        dt = timeit(epoch_comb, table)
        rows.append((f"7tab[combined {kind}]", f"Vsum={v_tot}", dt / K * 1e3))


def main():
    print("backend:", jax.devices()[0].platform)
    correctness_check()
    rows = []
    bench_single_table(rows)
    bench_combined(rows)
    print(f"\n{'strategy':<28} {'shape':<14} ms/step")
    for name, shape, ms in rows:
        print(f"{name:<28} {shape:<14} {ms:8.3f}")


if __name__ == "__main__":
    main()
