"""Zoo-wide production-shape MFU table (VERDICT r4 #1).

Round 4 proved 38.4% of v5e bf16 peak for EmbeddingMLP only; every other
zoo model's recorded throughput is a dispatch-bound tiny-shape row. This
tool trains each model at a PRODUCTION shape — dim 64-128 embeddings,
wide bf16 towers, >=1M-row user table, T=64 histories for the sequence
models — through the REAL resident-epoch path (Trainer._train_epoch:
packed columns, pre-permuted, one scan dispatch) and reports ms/step,
TFLOP/s, %peak, plus a binding-resource estimate:

- mxu_frac  : analytic train matmul FLOPs (3x forward: fwd+dgrad+wgrad)
              vs 197 TFLOP/s bf16 peak;
- hbm_frac  : coarse bytes/step model (6x param bytes for Adam moment
              streams + embedding gather/scatter rows + activation
              traffic + packed xs reads) vs 819 GB/s;
- binding   : the larger fraction, or "dispatch/other" when both are
              small — sequence models may legitimately be scan-bound,
              which shows up as neither resource saturating.

Models: embedding_mlp, wide_deep, deepfm (v1), deepfm_v2, din (T=64),
dien (aux none + paper, in-graph negatives). NeuralCF's towers are
id-only MLPs — its production shape is the same matmul stack as
embedding_mlp minus the feature plane; covered by the MLP row.

    python tools/mfu_zoo.py                       # full table (TPU)
    python tools/mfu_zoo.py --models din,dien --batch 131072
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync

V5E_BF16_PEAK = 197e12
V5E_HBM_BPS = 819e9
STEPS = 8


def gen_epoch(n, user_vocab, movie_vocab, t):
    """27-column epoch with a T-length history, generated on device."""

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        f = {
            "movieId": jax.random.randint(ks[0], (n,), 1, movie_vocab,
                                          dtype=jnp.int32),
            "userId": jax.random.randint(ks[1], (n,), 1, user_vocab,
                                         dtype=jnp.int32),
        }
        hist_cols = [f"userRatedMovie{i}" for i in range(1, t + 1)]
        hk = jax.random.split(ks[2], len(hist_cols) + 8)
        for i, c in enumerate(hist_cols):
            f[c] = jax.random.randint(hk[i], (n,), 0, movie_vocab,
                                      dtype=jnp.int32)
        for i, c in enumerate(
            ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
             "userGenre5", "movieGenre1", "movieGenre2", "movieGenre3")
        ):
            f[c] = jax.random.randint(hk[len(hist_cols) + i], (n,), -1, 19,
                                      dtype=jnp.int32)
        nk = jax.random.split(ks[3], 8)
        for i, c in enumerate(
            ("releaseYear", "movieRatingCount", "movieAvgRating",
             "movieRatingStddev", "userRatingCount", "userAvgRating",
             "userRatingStddev")
        ):
            f[c] = jax.random.normal(nk[i], (n,), jnp.float32)
        labels = (jax.random.uniform(nk[7], (n,)) > 0.5).astype(jnp.float32)
        return f, labels

    return gen


def model_config(name, dim, hidden, t, user_vocab, movie_vocab, aux,
                 remat=None, lookup_dtype=None):
    """(model, loss_fn, fwd_flops_per_example, n_hist_cols)."""
    kw = dict(dim=dim, compute_dtype="bfloat16", user_buckets=user_vocab,
              movie_buckets=movie_vocab, lookup_dtype=lookup_dtype)
    if name == "embedding_mlp":
        m = build_model(name, hidden=hidden, **kw)
        f = 2.0 * ((10 * dim + 7) * hidden + hidden * hidden + hidden)
        return m, None, f, 0
    if name == "wide_deep":
        m = build_model(name, hidden=hidden, **kw)
        # deep tower (10D+7 -> H -> H -> 1); the 10k cross-hash wide path
        # is a bias gather (bytes, not FLOPs).
        f = 2.0 * ((10 * dim + 7) * hidden + hidden * hidden + hidden)
        return m, None, f, 1  # consumes userRatedMovie1 for the cross
    if name == "deepfm":
        m = build_model(name, deep_hidden=hidden, **kw)
        f = 2.0 * ((2 * dim + 7) * hidden + hidden * hidden
                   + (hidden + 4) + 4 * dim)
        return m, None, f, 0
    if name == "deepfm_v2":
        # field_dim rides dim: the FM cross IS the production question.
        m = build_model(name, field_dim=dim, deep_hidden=hidden, **kw)
        fdim = dim
        f = 2.0 * ((4 * dim + 7) * fdim          # 5 field projections
                   + 6 * fdim                     # fm sum-sq - sq-sum
                   + 5 * fdim * hidden            # deep1
                   + hidden * (hidden // 2)       # deep2
                   + (1 + fdim + hidden // 2))
        return m, None, f, 0
    if name == "din":
        m = build_model(name, hidden=hidden, recent_movies=t, **kw)
        att = 32
        f = 2.0 * (t * (4 * dim * att + att)     # activation unit
                   + (5 * dim + 7) * hidden + hidden * (hidden // 2)
                   + hidden // 2)
        return m, None, f, t
    if name == "dien":
        m = build_model(
            name, hidden=hidden, recent_movies=t, aux_mode=aux,
            recurrence_remat=remat, **kw
        )
        loss = dien_loss_fn(
            aux_mode=aux, alpha=0.1,
            in_graph_negatives=(aux != "none"), recent_movies=t,
            movie_vocab=movie_vocab,
        )
        f = (12.0 * dim * dim * t * 2             # GRU x/h matmuls (2x[D,3D])
             + 12.0 * dim * dim * t               # AUGRU 3 gates x 2 [D,D]
             + 2.0 * t * (dim * 32 + 32)          # attention
             + (5 * dim + 7) * hidden * 2 + hidden * hidden   # towers
             + hidden)
        if aux != "none":
            f += 2.0 * (t - 1) * 2 * (2 * dim * 32 + 32)
        return m, loss, f, t
    raise KeyError(name)


def hbm_bytes_per_step(name, dim, hidden, t, batch, user_vocab, movie_vocab):
    """Coarse HBM traffic model, bytes/step (labels are estimates)."""
    params = user_vocab * dim + movie_vocab * dim + 12 * dim * dim
    params += (10 * dim + 7) * hidden + hidden * hidden
    adam = 6.0 * 4 * params                  # read+write p/mu/nu
    gathers = 3.0 * 4 * batch * dim * (2 + min(t, 8))  # fwd read + bwd scatter
    acts = 4.0 * 4 * batch * (10 * dim + 2 * hidden)
    if name in ("din", "dien"):
        acts += 4.0 * 4 * batch * t * dim * (2 if name == "din" else 6)
    xs = 2.0 * 4 * batch * (27 + t)
    return adam + gathers + acts + xs


def measure(trainer, data, labels, n, batch):
    sample = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    params = trainer.init_params(sample)
    carry = (params, trainer.init_opt_state(params), M.init_metrics())
    carry = trainer._train_epoch(
        *carry, data, labels, jax.random.PRNGKey(0),
        n=n, batch_size=batch, shuffle=True,
    )
    hard_sync(carry[0])
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        carry = trainer._train_epoch(
            *carry, data, labels, jax.random.PRNGKey(i + 1),
            n=n, batch_size=batch, shuffle=True,
        )
        hard_sync(carry[0])
        best = min(best, time.perf_counter() - t0)
        time.sleep(2.0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models",
                    default="embedding_mlp,wide_deep,deepfm,deepfm_v2,"
                    "din,dien,dien_paper")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--seq-batch", type=int, default=65536,
                    help="batch for din/dien (T=64 histories: the [B,T,D] "
                    "activations at 262144 would blow HBM)")
    ap.add_argument("--user-vocab", type=int, default=1 << 20)
    ap.add_argument("--movie-vocab", type=int, default=1 << 17)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the DIEN GRU/AUGRU scan bodies "
                    "(drops the [T,B,H] residual stacks; the knob for "
                    "batches whose compile OOMs HBM)")
    ap.add_argument("--lookup-dtype", default="",
                    help="bf16 cast-before-gather on the big id tables "
                    "(fp32 master params; quality-neutral per the Zipf "
                    "A/B) — halves the embedding-bound models' binding "
                    "bytes")
    ap.add_argument("--bf16-moments", action="store_true",
                    help="TrainConfig.big_moment_dtype=bfloat16 — halves "
                    "the big tables' Adam moment HBM (both stream bytes "
                    "and residency; the quality cost is measured in "
                    "BASELINE.md, tools/moment_dtype_ab.py)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    print("backend:", jax.devices()[0].platform, flush=True)
    rows = []
    for spec in args.models.split(","):
        name, aux = spec, "none"
        if spec == "dien":
            aux = "none"
        elif spec == "dien_paper":
            name, aux = "dien", "paper"
        seq = name in ("din", "dien")
        batch = args.seq_batch if seq else args.batch
        t = args.t if seq else 5
        n = batch * STEPS
        data, labels = gen_epoch(
            n, args.user_vocab, args.movie_vocab, t if seq else max(t, 1)
        )(jax.random.PRNGKey(0))
        model, loss_fn, fwd_f, _ = model_config(
            name, args.dim, args.hidden, t, args.user_vocab,
            args.movie_vocab, aux,
            remat=True if args.remat else None,  # None = model auto (T>=64)
            lookup_dtype=args.lookup_dtype or None,
        )
        trainer = Trainer(
            model,
            TrainConfig(
                batch_size=batch, epochs=1, shuffle_mode="blocks",
                big_moment_dtype=(
                    "bfloat16" if args.bf16_moments else "float32"
                ),
            ),
            loss_fn=loss_fn,
        )
        trainer._build_steps()
        try:
            secs = measure(trainer, data, labels, n, batch)
        except Exception as e:
            print(json.dumps({"model": spec, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
            del data, labels
            continue
        train_f = 3.0 * fwd_f
        tflops = train_f * n / secs / 1e12
        mxu = tflops * 1e12 / V5E_BF16_PEAK
        hbm_b = hbm_bytes_per_step(
            name, args.dim, args.hidden, t, batch, args.user_vocab,
            args.movie_vocab,
        )
        hbm = hbm_b * (n / batch) / secs / V5E_HBM_BPS
        binding = ("MXU" if mxu >= max(hbm, 0.15)
                   else "HBM(est)" if hbm >= 0.15
                   else "dispatch/scan")
        row = {
            "model": spec, "dim": args.dim, "hidden": args.hidden,
            "t": t if seq else None, "batch": batch,
            "ms_per_step": round(secs / STEPS * 1e3, 2),
            "ex_per_sec_M": round(n / secs / 1e6, 2),
            "tflops": round(tflops, 1),
            "mfu_pct": round(mxu * 100, 1),
            "hbm_frac_est": round(hbm, 3),
            "binding": binding,
            "flops_per_example_M": round(train_f / 1e6, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del data, labels

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": vars(args), "rows": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
