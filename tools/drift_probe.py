"""Learnability probes for the drift generator (VERDICT r4 #3 campaign).

The drift stage came out maximally discriminative (terminal-only DIN /
DIEN at chance under an 0.93 oracle) — but a stage whose baseline can't
learn proves nothing unless the signal is shown to be SGD-extractable
at all. These probes close that hole with the generator's own
functional form:

  separate : logit = <mean-pool E[hist], B[cand]>, E and B learned
             independently (matches the generator's independent
             observation/label matrices)
  shared   : logit = <mean-pool E[hist], E[cand]> — ONE table serving
             both roles, like the models' emb_movie_shared

Measured (cached 1.3M-row drift dataset, CPU, dim 16, Adam 1e-2):
separate 0.6135 after ONE epoch, shared 0.6046 — the signal is
trivially learnable and role-sharing is not the blocker. With every
end-to-end config at 0.50 (aux none/0.02/0.1/0.5 mean-norm, 12 and 24
epochs, 3 seeds), the binding failure is the full architectures'
multiplicative-interaction discovery at this per-step SNR — which
per-step auxiliary supervision does NOT remediate. BASELINE.md round-5
DIEN aux section.

    python tools/drift_probe.py --cache /tmp/drift_t64_1p3M.npz \
        [--variant separate|shared] [--epochs 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from sparrowrecsys_tpu.ops.metrics import exact_auc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True,
                    help="npz written by tools/seq_signal.py --dataset-cache")
    ap.add_argument("--variant", default="separate",
                    choices=("separate", "shared"))
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--test-n", type=int, default=300_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--vocab", type=int, default=1001)
    args = ap.parse_args()

    z = np.load(args.cache)
    hist = np.stack(
        [z[f"userRatedMovie{k}"] for k in range(1, args.t + 1)], 1
    )
    cand = z["movieId"]
    y = z["__labels__"]
    n_tr, n_te = args.n, args.test_n
    v, d = args.vocab, args.dim

    key = jax.random.PRNGKey(0)
    params = {"E": 0.1 * jax.random.normal(key, (v, d)),
              "s": jnp.ones(()), "b": jnp.zeros(())}
    if args.variant == "separate":
        params["B"] = 0.1 * jax.random.normal(
            jax.random.fold_in(key, 1), (v, d)
        )
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    def cand_table(p):
        return p["B"] if args.variant == "separate" else p["E"]

    def loss_fn(p, h, c, yy):
        e = p["E"][h]
        m = (h > 0)[..., None]
        pooled = (e * m).sum(1) / jnp.maximum(m.sum(1), 1)
        logit = p["s"] * (pooled * cand_table(p)[c]).sum(-1) + p["b"]
        return optax.sigmoid_binary_cross_entropy(logit, yy).mean()

    @jax.jit
    def step(p, o, h, c, yy):
        _, g = jax.value_and_grad(loss_fn)(p, h, c, yy)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o

    bs = args.batch_size
    t0 = time.perf_counter()
    for ep in range(args.epochs):
        perm = np.random.default_rng(ep).permutation(n_tr)
        for i in range(0, n_tr - bs + 1, bs):
            idx = perm[i:i + bs]
            params, opt = step(params, opt, hist[idx], cand[idx], y[idx])
        e_tab = np.asarray(params["E"])
        c_tab = np.asarray(cand_table(params))
        logits = []
        for i in range(n_tr, n_tr + n_te, 65536):
            e = e_tab[hist[i:i + 65536]]
            m = (hist[i:i + 65536] > 0)[..., None]
            pooled = (e * m).sum(1) / np.maximum(m.sum(1), 1)
            logits.append((pooled * c_tab[cand[i:i + 65536]]).sum(-1))
        lg = (float(params["s"]) * np.concatenate(logits)
              + float(params["b"]))
        auc = exact_auc(1 / (1 + np.exp(-lg)), y[n_tr:n_tr + n_te])
        print(f"{args.variant} epoch {ep + 1}: auc {auc['roc_auc']:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
