"""Experiment 10b: land-ready variants of the exp10 merged-gather win.

exp10 C (pre-merged [V, 11] emb+bias tables) is +74% on the full DeepFM
step. To land it WITHOUT changing the flax param tree (checkpoints, seed
-pinned parity bands), the concat must happen in-graph each step from
the separate [V,10] + [V,1] params. Tables are tiny (<=1.3 MB), so the
copy is noise *if* XLA schedules it well — that's what C2 measures.

F measures the embedding_mlp-shaped pattern: 8 genre columns each
gathering a private [19, 10] table -> concat to [152, 10] in-graph and
do ONE [B, 8] offset gather (plus movie/user/5-history gathers).

    python tools/step_exp10b.py
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

BATCH = 65536
STEPS = 16
DIM = 10
MOVIE_V = 1001
USER_V = 30001
GENRE_V = 19
DEEP = 64

from tools.step_exp10 import (  # noqa: E402
    fwd_a,
    fwd_c,
    head,
    lookup,
    make_params,
    merge_tables,
    train_epoch,
)


def fwd_c2(p, ids, nums):
    """C with the concat INSIDE the step (param tree unchanged)."""
    pm = merge_tables(p)
    return fwd_c(pm, ids, nums)


# --- embedding_mlp-shaped model: 8 genre cols + movie + user + 5 history ---


def make_mlp_params(key):
    ks = jax.random.split(key, 12)
    scale = 0.05
    p = {
        "emb_movie": jax.random.uniform(ks[0], (MOVIE_V, DIM), jnp.float32, -scale, scale),
        "emb_user": jax.random.uniform(ks[1], (USER_V, DIM), jnp.float32, -scale, scale),
        "deep1_w": jax.random.normal(ks[2], (7 + 10 * DIM, 128)) * 0.05,
        "deep1_b": jnp.zeros((128,)),
        "deep2_w": jax.random.normal(ks[3], (128, 128)) * 0.05,
        "deep2_b": jnp.zeros((128,)),
        "out_w": jax.random.normal(ks[4], (128, 1)) * 0.05,
        "out_b": jnp.zeros((1,)),
    }
    for j in range(8):
        p[f"emb_g{j}"] = jax.random.uniform(
            ks[4 + j % 8], (GENRE_V, DIM), jnp.float32, -scale, scale
        )
    return p


def mlp_head(p, parts, nums):
    x = jnp.concatenate([nums] + parts, axis=-1)
    x = jax.nn.relu(x @ p["deep1_w"] + p["deep1_b"])
    x = jax.nn.relu(x @ p["deep2_w"] + p["deep2_b"])
    return (x @ p["out_w"])[:, 0] + p["out_b"][0]


def fwd_mlp_pertable(p, ids, nums):
    # ids: [B, 10] = 8 genre cols + movieId + userId
    parts = [lookup(p[f"emb_g{j}"], ids[:, j]) for j in range(8)]
    parts.append(lookup(p["emb_movie"], ids[:, 8]))
    parts.append(lookup(p["emb_user"], ids[:, 9]))
    return mlp_head(p, parts, nums)


def fwd_mlp_packed(p, ids, nums):
    # one [B, 8] gather over the in-graph concat of the 8 genre tables
    gt = jnp.concatenate([p[f"emb_g{j}"] for j in range(8)], axis=0)  # [152, D]
    g = ids[:, :8]
    valid = (g >= 0) & (g < GENRE_V)
    offs = (jnp.arange(8, dtype=jnp.int32) * GENRE_V)[None, :]
    gids = jnp.clip(g, 0, GENRE_V - 1) + offs
    ge = jnp.where(valid[..., None], jnp.take(gt, gids, axis=0), 0.0)  # [B, 8, D]
    parts = [ge.reshape(ids.shape[0], 8 * DIM)]
    parts.append(lookup(p["emb_movie"], ids[:, 8]))
    parts.append(lookup(p["emb_user"], ids[:, 9]))
    return mlp_head(p, parts, nums)


def time_best(fn, reps=3):
    def sync(x):
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = BATCH * STEPS

    # --- deepfm shape ---
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
    la = fwd_a(p0, ids_d[0, :256], nums_d[0, :256])
    lc2 = fwd_c2(p0, ids_d[0, :256], nums_d[0, :256])
    print(f"max |A - C2| = {float(jnp.max(jnp.abs(la - lc2))):.3e}", flush=True)

    print(f"\ndeepfm full train step ({STEPS} x {BATCH}):", flush=True)
    for name, fwd, pp in (
        ("A per-table      ", fwd_a, p0),
        ("C  pre-merged    ", fwd_c, merge_tables(p0)),
        ("C2 in-graph merge", fwd_c2, p0),
    ):
        tx, ep = train_epoch(fwd)
        o0 = tx.init(pp)
        ep(pp, o0, ids_d, nums_d, lab_d)[0]["deep1_b"].block_until_ready()
        t = time_best(lambda: ep(pp, o0, ids_d, nums_d, lab_d))
        print(f"  {name} {t*1e3/STEPS:7.2f} ms/step {n/t/1e6:7.2f}M ex/s",
              flush=True)

    # --- embedding_mlp shape ---
    mids = np.concatenate(
        [
            rng.integers(-1, GENRE_V, (n, 8)),
            rng.integers(1, MOVIE_V, (n, 1)),
            rng.integers(1, USER_V, (n, 1)),
        ],
        axis=1,
    ).astype(np.int32)
    mids_d = jnp.asarray(mids.reshape(STEPS, BATCH, 10))

    mp = make_mlp_params(jax.random.PRNGKey(1))
    lp = fwd_mlp_pertable(mp, mids_d[0, :256], nums_d[0, :256])
    lq = fwd_mlp_packed(mp, mids_d[0, :256], nums_d[0, :256])
    print(f"\nmax |mlp per-table - packed| = "
          f"{float(jnp.max(jnp.abs(lp - lq))):.3e}", flush=True)

    print(f"mlp-shape full train step ({STEPS} x {BATCH}):", flush=True)
    for name, fwd in (
        ("per-table 10-gather", fwd_mlp_pertable),
        ("packed genre gather", fwd_mlp_packed),
    ):
        tx, ep = train_epoch(fwd)
        o0 = tx.init(mp)
        ep(mp, o0, mids_d, nums_d, lab_d)[0]["deep1_b"].block_until_ready()
        t = time_best(lambda: ep(mp, o0, mids_d, nums_d, lab_d))
        print(f"  {name} {t*1e3/STEPS:7.2f} ms/step {n/t/1e6:7.2f}M ex/s",
              flush=True)


if __name__ == "__main__":
    main()
