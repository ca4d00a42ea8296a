"""Attribute the post-fix MFU residual at the production shape (VERDICT r4 #2).

Round 4 reached 35-38% of v5e bf16 peak for EmbeddingMLP (dim 128,
hidden 1024, batch 262144, bf16 towers, block shuffle, 53.6 ms/step) and
stopped: the other ~62% of peak was unattributed. This tool re-runs the
decomposition AT that exact config, on one packed pre-permuted schedule
(identical batches across variants), splitting the backward:

  fwd          forward only                      (1 matmul set / layer)
  +dgrad       grads w.r.t. EMBEDDING params only — the dense towers
               contribute their activation-gradient (dgrad) chain but
               skip every weight gradient (wgrad) matmul
  +grad        full grads                        (3 matmul sets / layer)
  +sgd         full step, SGD                    (isolates Adam's moment streams)
  +adam        full step, fp32 moments           (the headline config)
  adam_bf16mom Adam with bf16 mu/nu on the two big embedding tables
               (halves the dominant moment-stream bytes; fp32 master
               params; quality A/B is the caller's to run)

Deltas between consecutive rows name the residual: (+dgrad − fwd) =
dgrad chain, (+grad − +dgrad) = wgrad, (+adam − +sgd) = moment streams.
Each row also prints the analytic matmul-bound ms at 197 TFLOP/s so
"above-bound" time is explicit.

    python tools/mfu_attrib.py [--batch 262144] [--dim 128] [--hidden 1024]
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
import optax

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.loop import Trainer, _default_loss, hard_sync
from tools.mfu_demo import V5E_BF16_PEAK, gen_epoch, train_flops_per_example

STEPS = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--user-vocab", type=int, default=1 << 20)
    ap.add_argument("--movie-vocab", type=int, default=1 << 17)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    dim, hidden, batch = args.dim, args.hidden, args.batch
    n = batch * STEPS
    print("backend:", jax.devices()[0].platform, flush=True)
    data, labels = gen_epoch(n, args.user_vocab, args.movie_vocab)(
        jax.random.PRNGKey(0)
    )
    model = build_model(
        "embedding_mlp", dim=dim, hidden=hidden, compute_dtype="bfloat16",
        user_buckets=args.user_vocab, movie_buckets=args.movie_vocab,
    )
    apply_fn = model.apply

    int_cols = sorted(k for k, v in data.items() if v.dtype == jnp.int32)
    flt_cols = sorted(k for k, v in data.items() if v.dtype != jnp.int32)
    int_mat = jnp.stack([data[k] for k in int_cols], axis=1)
    flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels], axis=1)
    del data, labels

    trainer = Trainer(model, TrainConfig(batch_size=batch, epochs=1))
    sample = {
        k: np.zeros((2,), np.int32 if k in int_cols else np.float32)
        for k in int_cols + flt_cols
    }
    params = trainer.init_params(sample)
    emb_keys = tuple(k for k in params if k.startswith("emb_"))
    big_tables = ("emb_userId", "emb_movieId")

    flops_ex = train_flops_per_example(dim, hidden)  # 3x forward
    steps = n // batch

    def feats_of(x):
        f = {k: x["i"][:, j] for j, k in enumerate(int_cols)}
        for j, k in enumerate(flt_cols):
            f[k] = x["f"][:, j]
        return f, x["f"][:, -1]

    def lf(pp, feats, lab):
        out = _default_loss(apply_fn, pp, feats, lab,
                            jnp.ones((batch,), jnp.float32))
        return out[0]

    def make_epoch(mode, donate=False):
        adam = trainer.tx
        sgd = optax.sgd(1e-3)

        def epoch(params, opt_state, key):
            perm = jax.random.permutation(key, n)
            xi = int_mat[perm].reshape(steps, batch, -1)
            xf = flt_mat[perm].reshape(steps, batch, -1)

            def body(carry, x):
                p0, o0 = carry
                feats, lab = feats_of(x)
                if mode == "fwd":
                    return (p0, o0), lf(p0, feats, lab)
                if mode == "dgrad":
                    # Grads w.r.t. embedding tables ONLY: every dense
                    # layer runs its dgrad (the chain must reach the
                    # gathers) but NO tower wgrad matmul is emitted.
                    emb = {k: p0[k] for k in emb_keys}
                    rest = {k: v for k, v in p0.items() if k not in emb_keys}
                    loss, g = jax.value_and_grad(
                        lambda e: lf({**rest, **e}, feats, lab)
                    )(emb)
                    p1 = dict(p0)
                    for k in emb_keys:
                        p1[k] = jax.tree.map(
                            lambda a, gg: a - 0.0 * gg, p0[k], g[k]
                        )
                    return (p1, o0), loss
                loss, grads = jax.value_and_grad(
                    lambda p: lf(p, feats, lab)
                )(p0)
                if mode == "grad":
                    p1 = jax.tree.map(lambda a, g: a - 0.0 * g, p0, grads)
                    return (p1, o0), loss
                if mode == "sgd":
                    upd, o1 = sgd.update(grads, o0, p0)
                    return (optax.apply_updates(p0, upd), o1), loss
                if mode == "adam_bf16mom":
                    # Hand-rolled Adam; mu/nu for the two big tables kept
                    # bf16 (halves their stream bytes), fp32 elsewhere.
                    cnt, mu, nu = o1_unpack(o0)
                    cnt = cnt + 1
                    tf_ = cnt.astype(jnp.float32)
                    c1 = 1.0 - 0.9 ** tf_
                    c2 = 1.0 - 0.999 ** tf_

                    def upd_leaf(path_is_big, m, v_, g, p):
                        gm = g.astype(m.dtype)
                        m1 = 0.9 * m + 0.1 * gm
                        v1 = 0.999 * v_ + 0.001 * (gm * gm)
                        u = (-1e-3 * (m1.astype(jnp.float32) / c1)
                             / (jnp.sqrt(v1.astype(jnp.float32) / c2) + 1e-7))
                        return m1, v1, p + u

                    flatg, treedef = jax.tree_util.tree_flatten(grads)
                    flatp = treedef.flatten_up_to(p0)
                    m2, v2, pnew = [], [], []
                    for m, v_, g, p in zip(mu, nu, flatg, flatp):
                        a, b, c = upd_leaf(None, m, v_, g, p)
                        m2.append(a)
                        v2.append(b)
                        pnew.append(c)
                    return (
                        jax.tree_util.tree_unflatten(treedef, pnew),
                        (cnt, m2, v2),
                    ), loss
                upd, o1 = adam.update(grads, o0, p0)
                return (optax.apply_updates(p0, upd), o1), loss

            def o1_unpack(o):
                return o

            (p1, o1), losses = jax.lax.scan(
                body, (params, opt_state), {"i": xi, "f": xf}
            )
            return p1, o1, losses.sum()

        if donate:
            return jax.jit(epoch, donate_argnums=(0, 1))
        return jax.jit(epoch)

    def init_opt(mode):
        if mode in ("fwd", "dgrad", "grad"):
            return jnp.zeros(())
        if mode == "sgd":
            return optax.sgd(1e-3).init(params)
        if mode == "adam_bf16mom":
            flatp, treedef = jax.tree_util.tree_flatten(params)
            paths = jax.tree_util.tree_flatten_with_path(params)[0]

            def mom(pathleaf):
                path, leaf = pathleaf
                big = any(
                    getattr(k, "key", None) in big_tables for k in path
                )
                dt = jnp.bfloat16 if big else jnp.float32
                return jnp.zeros(leaf.shape, dt)

            mu = [mom(pl) for pl in paths]
            nu = [mom(pl) for pl in paths]
            return (jnp.zeros((), jnp.int32), mu, nu)
        return trainer.tx.init(params)

    # Ideal matmul-bound ms/step per mode at peak.
    fwd_f = flops_ex / 3.0
    bound = {
        "fwd": fwd_f, "dgrad": 2 * fwd_f, "grad": 3 * fwd_f,
        "sgd": 3 * fwd_f, "adam": 3 * fwd_f, "adam_donate": 3 * fwd_f,
        "adam_bf16mom": 3 * fwd_f,
    }
    results = {}
    for mode, donate in (
        ("fwd", False), ("dgrad", False), ("grad", False), ("sgd", False),
        ("adam", False), ("adam_donate", True), ("adam_bf16mom", False),
    ):
        ep = make_epoch("adam" if mode == "adam_donate" else mode,
                        donate=donate)
        label = mode
        o0 = init_opt("adam" if mode == "adam_donate" else mode)
        # The donate variant consumes its inputs — feed it copies so the
        # shared `params` survives for later variants.
        p_first = jax.tree.map(jnp.copy, params) if donate else params
        p1, o1, s = ep(p_first, o0, jax.random.PRNGKey(0))
        hard_sync(p1)
        np.asarray(s)
        best = float("inf")
        for i in range(args.rounds):
            if donate:
                # donated buffers: thread the outputs back in
                p_in, o_in = p1, o1
            else:
                p_in, o_in = params, o0
            t0 = time.perf_counter()
            p1, o1, s = ep(p_in, o_in, jax.random.PRNGKey(i + 1))
            hard_sync(p1)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
            time.sleep(2.0)
        ms = best / steps * 1e3
        ideal = bound[label] * batch / V5E_BF16_PEAK * 1e3
        tf = bound[label] * n / best / 1e12
        results[label] = ms
        print(
            f"{label:<13} {ms:8.2f} ms/step  (matmul bound {ideal:6.2f} ms, "
            f"{tf:6.1f} TFLOP/s, {tf / (V5E_BF16_PEAK / 1e12) * 100:5.1f}% "
            f"peak)",
            flush=True,
        )

    r = results
    if {"fwd", "dgrad", "grad", "sgd", "adam"} <= set(r):
        print("attribution (ms/step):", flush=True)
        print(f"  forward            {r['fwd']:7.2f}")
        print(f"  dgrad chain        {r['dgrad'] - r['fwd']:7.2f}")
        print(f"  wgrad matmuls      {r['grad'] - r['dgrad']:7.2f}")
        print(f"  sgd apply          {r['sgd'] - r['grad']:7.2f}")
        print(f"  adam moment stream {r['adam'] - r['sgd']:7.2f}")
        if "adam_donate" in r:
            print(f"  donation saves     {r['adam'] - r['adam_donate']:7.2f}")
        if "adam_bf16mom" in r:
            print(f"  bf16 moments save  {r['adam'] - r['adam_bf16mom']:7.2f}")


if __name__ == "__main__":
    main()
