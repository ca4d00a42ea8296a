"""Experiment 10: where does the forward-bound DeepFM step spend its time?

step_exp8 showed the train step is ~88% forward; the roofline says FLOPs
are negligible, so the candidates are (a) tile-amplified random embedding
gathers — every gathered [V, 10] row drags a whole (8, 128) HBM tile,
~4 KB for 40 B useful — and (b) per-op overhead of the 8 lookup chains.

Variants (all bitwise- or numerically-identical forward math except B):
  A. per-table baseline (8 gathers: 4 emb + 4 bias)     — step_exp9's A side
  B. zero-embedding control (no gathers at all)         — bounds total gather cost
  C. emb+bias merged per id column (4 gathers of [V,11])— halves gather count
  D. bf16 gather tables, f32 compute after the gather   — halves tile bytes
  E. genre tables via one-hot matmul (19-row tables)    — MXU instead of gather

Forward+loss only under the scan protocol (the step's dominant phase),
then full train step for the winners. Forced-sync best-of-3.

    python tools/step_exp10.py
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


def make_params(key):
    ks = jax.random.split(key, 8)
    scale = 0.05
    return {
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


def lookup(table, ids, lo=0):
    v = table.shape[0]
    safe = jnp.clip(ids, 0, v - 1)
    out = jnp.take(table, safe, axis=0)
    valid = (ids >= lo) & (ids < v)
    return jnp.where(valid[..., None] if out.ndim > ids.ndim else valid, out, 0.0)


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
    return head(p, item, user, ugv, mgv, first, nums)


def fwd_b(p, ids, nums):
    b = ids.shape[0]
    z = jnp.zeros((b, DIM), jnp.float32)
    first = jnp.zeros((b,), jnp.float32)
    # keep a data dependence on ids so nothing is constant-folded away
    z = z + (ids[:, :1] % 7).astype(jnp.float32) * 1e-9
    return head(p, z, z, z, z, first, nums)


def merge_tables(p):
    return {
        **p,
        "m_movie": jnp.concatenate([p["emb_movie"], p["bias_movie"][:, None]], axis=1),
        "m_user": jnp.concatenate([p["emb_user"], p["bias_user"][:, None]], axis=1),
        "m_ug": jnp.concatenate([p["emb_ug"], p["bias_ug"][:, None]], axis=1),
        "m_mg": jnp.concatenate([p["emb_mg"], p["bias_mg"][:, None]], axis=1),
    }


def fwd_c(p, ids, nums):
    mv, us, ug, mg = ids[:, 0], ids[:, 1], ids[:, 2], ids[:, 3]
    item_w = lookup(p["m_movie"], mv)
    user_w = lookup(p["m_user"], us)
    ug_w = lookup(p["m_ug"], ug)
    mg_w = lookup(p["m_mg"], mg)
    item, user = item_w[:, :DIM], user_w[:, :DIM]
    ugv, mgv = ug_w[:, :DIM], mg_w[:, :DIM]
    first = item_w[:, DIM] + user_w[:, DIM] + ug_w[:, DIM] + mg_w[:, DIM]
    return head(p, item, user, ugv, mgv, first, nums)


def cast_bf16(p):
    out = dict(p)
    for k in ("emb_movie", "emb_user", "emb_ug", "emb_mg",
              "bias_movie", "bias_user", "bias_ug", "bias_mg"):
        out[k] = p[k].astype(jnp.bfloat16)
    return out


def fwd_d(p, ids, nums):
    mv, us, ug, mg = ids[:, 0], ids[:, 1], ids[:, 2], ids[:, 3]
    item = lookup(p["emb_movie"], mv).astype(jnp.float32)
    user = lookup(p["emb_user"], us).astype(jnp.float32)
    ugv = lookup(p["emb_ug"], ug).astype(jnp.float32)
    mgv = lookup(p["emb_mg"], mg).astype(jnp.float32)
    first = (
        lookup(p["bias_movie"], mv).astype(jnp.float32)
        + lookup(p["bias_user"], us).astype(jnp.float32)
        + lookup(p["bias_ug"], ug).astype(jnp.float32)
        + lookup(p["bias_mg"], mg).astype(jnp.float32)
    )
    return head(p, item, user, ugv, mgv, first, nums)


def fwd_e(p, ids, nums):
    mv, us, ug, mg = ids[:, 0], ids[:, 1], ids[:, 2], ids[:, 3]
    item = lookup(p["emb_movie"], mv)
    user = lookup(p["emb_user"], us)
    oh_ug = jax.nn.one_hot(ug, GENRE_V, dtype=jnp.float32)  # -1 -> all-zero row
    oh_mg = jax.nn.one_hot(mg, GENRE_V, dtype=jnp.float32)
    ugv = oh_ug @ p["emb_ug"]
    mgv = oh_mg @ p["emb_mg"]
    first = (
        lookup(p["bias_movie"], mv)
        + lookup(p["bias_user"], us)
        + oh_ug @ p["bias_ug"]
        + oh_mg @ p["bias_mg"]
    )
    return head(p, item, user, ugv, mgv, first, nums)


def fwd_epoch(fwd):
    def loss_fn(p, ids, nums, labels):
        logits = fwd(p, ids, nums)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    @jax.jit
    def epoch(p, ids_all, nums_all, labels_all):
        def body(acc, x):
            ids, nums, labels = x
            return acc + loss_fn(p, ids, nums, labels), None

        return jax.lax.scan(body, 0.0, (ids_all, nums_all, labels_all))[0]

    return epoch


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


def time_best(fn, sync, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


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
    pm = merge_tables(p0)
    pb = cast_bf16(p0)

    # agreement checks (A is truth; C and E must match bitwise-ish)
    la = fwd_a(p0, ids_d[0, :256], nums_d[0, :256])
    for name, fwd, pp in (("C", fwd_c, pm), ("E", fwd_e, p0)):
        lx = fwd(pp, ids_d[0, :256], nums_d[0, :256])
        print(f"max |A - {name}| = {float(jnp.max(jnp.abs(la - lx))):.3e}",
              flush=True)
    ld = fwd_d(pb, ids_d[0, :256], nums_d[0, :256])
    print(f"max |A - D(bf16)| = {float(jnp.max(jnp.abs(la - ld))):.3e}",
          flush=True)

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]

    print(f"\nforward+loss only ({STEPS} steps x batch {BATCH}):", flush=True)
    for name, fwd, pp in (
        ("A per-table ", fwd_a, p0),
        ("B no-gather ", fwd_b, p0),
        ("C merged    ", fwd_c, pm),
        ("D bf16-gath ", fwd_d, pb),
        ("E genre-mm  ", fwd_e, p0),
    ):
        ep = fwd_epoch(fwd)
        ep(pp, ids_d, nums_d, lab_d).block_until_ready()  # compile
        t = time_best(lambda: ep(pp, ids_d, nums_d, lab_d), sync)
        print(f"  {name} {t*1e3/STEPS:7.2f} ms/step "
              f"{n/t/1e6:7.2f}M ex/s", flush=True)

    print(f"\nfull train step ({STEPS} steps x batch {BATCH}):", flush=True)
    for name, fwd, pp in (
        ("A per-table ", fwd_a, p0),
        ("C merged    ", fwd_c, pm),
        ("E genre-mm  ", fwd_e, p0),
    ):
        tx, ep = train_epoch(fwd)
        o0 = tx.init(pp)
        ep(pp, o0, ids_d, nums_d, lab_d)[0]["deep1_b"].block_until_ready()
        t = time_best(lambda: ep(pp, o0, ids_d, nums_d, lab_d), sync)
        print(f"  {name} {t*1e3/STEPS:7.2f} ms/step "
              f"{n/t/1e6:7.2f}M ex/s", flush=True)


if __name__ == "__main__":
    main()
