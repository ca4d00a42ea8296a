"""Experiment 9: unified embedding table vs per-table lookups (DeepFM).

Post-prepermute the train step is ~88% forward-bound (tools/step_exp8.py,
BASELINE.md) and the roofline says neither HBM nor MXU binds — the cost
is per-op dispatch inside the scanned step. DeepFM's forward runs 8
separate `embed_lookup`s (movie/user/2 genre embeddings + 4 bias
gathers), each expanding to clip/take/compare/where chains (~40 ops of
the ~100-op step).

Restructure: concatenate the four [V, 10] embedding tables into ONE
[31040, 10] table and the four bias columns into one [31040, 1] table,
precompute per-column id offsets, and look everything up with a single
[B, 4] gather per table (+ one vectorized validity mask). Same math —
zero rows for OOV/-1, same init distribution per segment — ~10 ops
instead of ~40.

This A/Bs hand-rolled DeepFM steps (shared optax Adam, same batch data,
scan over steps, forced sync) so the op-count delta is isolated from the
trainer machinery:

    python tools/step_exp9.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH = 65536
STEPS = 16
DIM = 10
MOVIE_V = 1001
USER_V = 30001
GENRE_V = 19
DEEP = 64

# Column layout for the packed id matrix: movieId, userId, userGenre1,
# movieGenre1. Genres use -1 as OOV.
SEG_SIZES = (MOVIE_V, USER_V, GENRE_V, GENRE_V)
SEG_OFFSETS = tuple(int(x) for x in np.concatenate([[0], np.cumsum(SEG_SIZES)[:-1]]))
UNIFIED_V = int(sum(SEG_SIZES))


def make_params(key):
    ks = jax.random.split(key, 8)
    scale = 0.05
    p = {
        "emb_movie": jax.random.uniform(ks[0], (MOVIE_V, DIM), jnp.float32, -scale, scale),
        "emb_user": jax.random.uniform(ks[1], (USER_V, DIM), jnp.float32, -scale, scale),
        "emb_ug": jax.random.uniform(ks[2], (GENRE_V, DIM), jnp.float32, -scale, scale),
        "emb_mg": jax.random.uniform(ks[3], (GENRE_V, DIM), jnp.float32, -scale, scale),
        "bias_movie": jnp.zeros((MOVIE_V,)),
        "bias_user": jnp.zeros((USER_V,)),
        "bias_ug": jnp.zeros((GENRE_V,)),
        "bias_mg": jnp.zeros((GENRE_V,)),
        "deep1_w": jax.random.normal(ks[4], (7 + 2 * DIM, DEEP)) * 0.05,
        "deep1_b": jnp.zeros((DEEP,)),
        "deep2_w": jax.random.normal(ks[5], (DEEP, DEEP)) * 0.05,
        "deep2_b": jnp.zeros((DEEP,)),
        "out_w": jax.random.normal(ks[6], (4 + DEEP, 1)) * 0.05,
        "out_b": jnp.zeros((1,)),
    }
    return p


def to_unified(p):
    """Same values, unified layout (segment concat along rows)."""
    u = {
        "emb": jnp.concatenate(
            [p["emb_movie"], p["emb_user"], p["emb_ug"], p["emb_mg"]], axis=0
        ),
        "bias": jnp.concatenate(
            [p["bias_movie"], p["bias_user"], p["bias_ug"], p["bias_mg"]]
        ),
    }
    for k in ("deep1_w", "deep1_b", "deep2_w", "deep2_b", "out_w", "out_b"):
        u[k] = p[k]
    return u


def lookup(table, ids, lo=0):
    v = table.shape[0]
    safe = jnp.clip(ids, 0, v - 1)
    out = jnp.take(table, safe, axis=0)
    valid = (ids >= lo) & (ids < v)
    return jnp.where(valid[..., None] if out.ndim > ids.ndim else valid, out, 0.0)


def fwd_pertable(p, ids, nums):
    mv, us, ug, mg = ids[:, 0], ids[:, 1], ids[:, 2], ids[:, 3]
    item = lookup(p["emb_movie"], mv)
    user = lookup(p["emb_user"], us)
    ugv = lookup(p["emb_ug"], ug)
    mgv = lookup(p["emb_mg"], mg)
    first = (
        lookup(p["bias_movie"], mv)
        + lookup(p["bias_user"], us)
        + lookup(p["bias_ug"], ug)
        + lookup(p["bias_mg"], mg)
    )
    dots = jnp.stack(
        [
            jnp.sum(item * user, -1),
            jnp.sum(ugv * mgv, -1),
            jnp.sum(mgv * user, -1),
            jnp.sum(item * ugv, -1),
        ],
        axis=-1,
    )
    deep = jnp.concatenate([nums, item, user], axis=-1)
    deep = jax.nn.relu(deep @ p["deep1_w"] + p["deep1_b"])
    deep = jax.nn.relu(deep @ p["deep2_w"] + p["deep2_b"])
    x = jnp.concatenate([dots, deep], axis=-1)
    return (x @ p["out_w"])[:, 0] + p["out_b"][0] + first


def fwd_unified(p, ids, nums):
    # ids: [B, 4] raw per-column ids; offsets applied in-graph (cheap,
    # one add on [B, 4]); validity computed vectorized on raw ids.
    offs = jnp.asarray(SEG_OFFSETS, jnp.int32)
    sizes = jnp.asarray(SEG_SIZES, jnp.int32)
    valid = (ids >= 0) & (ids < sizes[None, :])
    uids = jnp.clip(ids, 0, sizes[None, :] - 1) + offs[None, :]
    emb = jnp.take(p["emb"], uids, axis=0)  # [B, 4, D]
    emb = jnp.where(valid[..., None], emb, 0.0)
    first = jnp.sum(
        jnp.where(valid, jnp.take(p["bias"], uids, axis=0), 0.0), axis=-1
    )
    item, user, ugv, mgv = emb[:, 0], emb[:, 1], emb[:, 2], emb[:, 3]
    dots = jnp.stack(
        [
            jnp.sum(item * user, -1),
            jnp.sum(ugv * mgv, -1),
            jnp.sum(mgv * user, -1),
            jnp.sum(item * ugv, -1),
        ],
        axis=-1,
    )
    deep = jnp.concatenate([nums, item, user], axis=-1)
    deep = jax.nn.relu(deep @ p["deep1_w"] + p["deep1_b"])
    deep = jax.nn.relu(deep @ p["deep2_w"] + p["deep2_b"])
    x = jnp.concatenate([dots, deep], axis=-1)
    return (x @ p["out_w"])[:, 0] + p["out_b"][0] + first


def make_epoch(fwd):
    tx = optax.adam(1e-3, eps=1e-7)

    def loss_fn(p, ids, nums, labels):
        logits = fwd(p, ids, nums)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(p, opt_state, ids_all, nums_all, labels_all):
        def body(carry, x):
            p, o = carry
            ids, nums, labels = x
            _, g = jax.value_and_grad(loss_fn)(p, ids, nums, labels)
            upd, o = tx.update(g, o, p)
            return (optax.apply_updates(p, upd), o), None

        return jax.lax.scan(body, (p, opt_state), (ids_all, nums_all, labels_all))[0]

    return tx, epoch


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = BATCH * STEPS
    ids = np.stack(
        [
            rng.integers(1, MOVIE_V, n),
            rng.integers(1, USER_V, n),
            rng.integers(-1, GENRE_V, n),
            rng.integers(-1, GENRE_V, n),
        ],
        axis=1,
    ).astype(np.int32)
    nums = rng.normal(size=(n, 7)).astype(np.float32)
    labels = (rng.random(n) > 0.5).astype(np.float32)
    ids_d = jnp.asarray(ids.reshape(STEPS, BATCH, 4))
    nums_d = jnp.asarray(nums.reshape(STEPS, BATCH, 7))
    lab_d = jnp.asarray(labels.reshape(STEPS, BATCH))

    p0 = make_params(jax.random.PRNGKey(0))

    # numeric agreement check (tiny slice, CPU-safe)
    lp = fwd_pertable(p0, ids_d[0, :64], nums_d[0, :64])
    lu = fwd_unified(to_unified(p0), ids_d[0, :64], nums_d[0, :64])
    err = float(jnp.max(jnp.abs(lp - lu)))
    print(f"max |pertable - unified| logit diff: {err:.2e}", flush=True)

    for label, fwd, prep in (
        ("pertable", fwd_pertable, lambda p: p),
        ("unified", fwd_unified, to_unified),
    ):
        tx, epoch = make_epoch(fwd)
        p = prep(make_params(jax.random.PRNGKey(0)))
        o = tx.init(p)
        p, o = epoch(p, o, ids_d, nums_d, lab_d)
        np.asarray(jax.tree_util.tree_leaves(p)[0])[0]
        best = float("inf")
        for _ in range(3):
            p_in, o_in = p, o
            t0 = time.perf_counter()
            p, o = epoch(p_in, o_in, ids_d, nums_d, lab_d)
            leaf = jax.tree_util.tree_leaves(p)[0]
            np.asarray(leaf[0])
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label:<10} {best/STEPS*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
