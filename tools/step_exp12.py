"""Experiment 12: packed multi-table lookup (one gather, per-table backward).

step_exp9 (unified table) showed a single packed [B, T] gather is bitwise-
identical forward but 21% SLOWER full-step because its BACKWARD becomes one
wide scatter into the concatenated table. This experiment keeps the packed
forward but splits the backward per table via a custom VJP
(`ops/embedding.py::packed_multi_lookup`): one-hot matmul at V <= 2048,
scatter-add above — exactly the landed `embed_lookup` policy.

A = landed DeepFM lookup block: 4x merged_embed_bias (one [V, 11] gather per
    id column, one-hot/scatter backward per table).
P = packed_embed_bias: ONE [4, B] take over the in-graph concat of the four
    merged tables, same per-table backward.

Both sides share the identical head; interleaved same-process full-step A/B
(forced sync, best-of-N) so tunnel phase hits both equally.

    python tools/step_exp12.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparrowrecsys_tpu.models.features import merged_embed_bias, packed_embed_bias

BATCH = 65536
STEPS = 16
DIM = 10
MOVIE_V = 1001
USER_V = 30001
GENRE_V = 19
DEEP = 64


def make_params(key):
    ks = jax.random.split(key, 8)
    scale = 0.05
    return {
        "emb_movie": jax.random.uniform(ks[0], (MOVIE_V, DIM), jnp.float32, -scale, scale),
        "emb_user": jax.random.uniform(ks[1], (USER_V, DIM), jnp.float32, -scale, scale),
        "emb_ug": jax.random.uniform(ks[2], (GENRE_V, DIM), jnp.float32, -scale, scale),
        "emb_mg": jax.random.uniform(ks[3], (GENRE_V, DIM), jnp.float32, -scale, scale),
        "bias_movie": jnp.zeros((MOVIE_V, 1)),
        "bias_user": jnp.zeros((USER_V, 1)),
        "bias_ug": jnp.zeros((GENRE_V, 1)),
        "bias_mg": jnp.zeros((GENRE_V, 1)),
        "deep1_w": jax.random.normal(ks[4], (7 + 2 * DIM, DEEP)) * 0.05,
        "deep1_b": jnp.zeros((DEEP,)),
        "deep2_w": jax.random.normal(ks[5], (DEEP, DEEP)) * 0.05,
        "deep2_b": jnp.zeros((DEEP,)),
        "out_w": jax.random.normal(ks[6], (4 + DEEP, 1)) * 0.05,
        "out_b": jnp.zeros((1,)),
    }


def head(p, item, user, ugv, mgv, first, nums):
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


def fwd_a(p, ids, nums):
    """Landed path: 4 merged_embed_bias lookups."""
    item, b_i = merged_embed_bias(p["emb_movie"], p["bias_movie"], ids[:, 0])
    user, b_u = merged_embed_bias(p["emb_user"], p["bias_user"], ids[:, 1])
    ugv, b_ug = merged_embed_bias(p["emb_ug"], p["bias_ug"], ids[:, 2])
    mgv, b_mg = merged_embed_bias(p["emb_mg"], p["bias_mg"], ids[:, 3])
    return head(p, item, user, ugv, mgv, b_i + b_u + b_ug + b_mg, nums)


def fwd_p(p, ids, nums):
    """Packed path: one gather across the four merged tables."""
    (item, b_i), (user, b_u), (ugv, b_ug), (mgv, b_mg) = packed_embed_bias(
        [
            (p["emb_movie"], p["bias_movie"], ids[:, 0]),
            (p["emb_user"], p["bias_user"], ids[:, 1]),
            (p["emb_ug"], p["bias_ug"], ids[:, 2]),
            (p["emb_mg"], p["bias_mg"], ids[:, 3]),
        ]
    )
    return head(p, item, user, ugv, mgv, b_i + b_u + b_ug + b_mg, nums)


def train_epoch(fwd):
    tx = optax.adam(1e-3, eps=1e-7)

    def loss_fn(p, ids, nums, labels):
        logits = fwd(p, ids, nums)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    @jax.jit
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

    # Agreement: forward bitwise, grads to float tolerance.
    la = fwd_a(p0, ids_d[0, :512], nums_d[0, :512])
    lp = fwd_p(p0, ids_d[0, :512], nums_d[0, :512])
    print(f"max |A - P| fwd = {float(jnp.max(jnp.abs(la - lp))):.3e}", flush=True)

    def loss(fwd, p):
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(
                fwd(p, ids_d[0, :512], nums_d[0, :512]), lab_d[0, :512]
            )
        )

    ga = jax.grad(lambda p: loss(fwd_a, p))(p0)
    gp = jax.grad(lambda p: loss(fwd_p, p))(p0)
    gd = max(
        float(jnp.max(jnp.abs(ga[k] - gp[k]))) for k in ga
    )
    print(f"max |A - P| grad = {gd:.3e}", flush=True)

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]

    runs = {}
    eps = {}
    for name, fwd in (("A merged x4", fwd_a), ("P packed   ", fwd_p)):
        tx, ep = train_epoch(fwd)
        o0 = tx.init(p0)
        sync(ep(p0, o0, ids_d, nums_d, lab_d)[0]["deep1_b"])  # compile
        eps[name] = (ep, o0)
        runs[name] = []

    print(f"\nfull train step, interleaved ({STEPS} x {BATCH}):", flush=True)
    for rep in range(5):
        for name, (ep, o0) in eps.items():
            t0 = time.perf_counter()
            sync(ep(p0, o0, ids_d, nums_d, lab_d)[0]["deep1_b"])
            runs[name].append(time.perf_counter() - t0)
    for name, ts in runs.items():
        t = min(ts)
        print(
            f"  {name} {t*1e3/STEPS:7.2f} ms/step {n/t/1e6:7.2f}M ex/s "
            f"(reps: {' '.join(f'{x*1e3/STEPS:.2f}' for x in ts)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
