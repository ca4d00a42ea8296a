"""Experiment 8: what bounds the post-prepermute DeepFM step?

The pre-permuted scan epoch runs at ~12M ex/s at batch 65536. This probe
measures the same epoch with (a) the full train step, (b) forward+loss
only (value, no grad — the compute lower bound for any training step),
and (c) forward+grad WITHOUT the optimizer update — isolating how much
of the remaining gap is backward compute vs Adam.

    python tools/step_exp8.py        # on the TPU
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, _default_loss, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=False)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    trainer = Trainer(build_model("deepfm"), TrainConfig(batch_size=BATCH, epochs=1))
    trainer._build_steps()
    params = trainer.init_params(sample_host)
    opt_state = trainer.tx.init(params)

    loss_fn = trainer.loss_fn or _default_loss
    apply_fn = trainer.model.apply

    def pack_like_epoch():
        # Reuse the trainer's packing by running one real epoch first;
        # for the fwd-only variants we pack here the same way: int cols
        # -> [N, Ci], float cols + labels -> [N, Cf + 1].
        int_cols = sorted(k for k, v in data.items() if v.dtype == jnp.int32)
        flt_cols = sorted(k for k, v in data.items() if v.dtype != jnp.int32)
        int_mat = jnp.stack([data[k] for k in int_cols], axis=1)
        flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels_d], axis=1)
        return int_cols, flt_cols, int_mat, flt_mat

    int_cols, flt_cols, int_mat, flt_mat = pack_like_epoch()
    steps = n // BATCH

    def make_epoch(mode: str):
        @jax.jit
        def epoch(params, opt_state, int_mat, flt_mat, key):
            p = jax.random.permutation(key, n)
            xi = int_mat[p].reshape(steps, BATCH, -1)
            xf = flt_mat[p].reshape(steps, BATCH, -1)

            def feats_of(x):
                f = {k: x["i"][:, j] for j, k in enumerate(int_cols)}
                for j, k in enumerate(flt_cols):
                    f[k] = x["f"][:, j]
                return f, x["f"][:, -1]

            if mode == "fwd":
                def body(carry, x):
                    feats, labels = feats_of(x)
                    mask = jnp.ones((BATCH,), jnp.float32)
                    loss = loss_fn(apply_fn, carry[0], feats, labels, mask)
                    loss = loss[0] if isinstance(loss, tuple) else loss
                    return (carry[0], carry[1] + loss), None

                carry, _ = jax.lax.scan(
                    body, (params, jnp.float32(0.0)), {"i": xi, "f": xf}
                )
                return carry[0], opt_state, carry[1]

            def body(carry, x):
                p0, o0 = carry
                feats, labels = feats_of(x)
                mask = jnp.ones((BATCH,), jnp.float32)

                def lf(pp):
                    out = loss_fn(apply_fn, pp, feats, labels, mask)
                    return out[0] if isinstance(out, tuple) else out

                loss, grads = jax.value_and_grad(lf)(p0)
                if mode == "grad":
                    # fold grads back without the optimizer: a trivial
                    # axpy so XLA can't DCE the backward
                    p1 = jax.tree.map(lambda a, g: a - 0.0 * g, p0, grads)
                    return (p1, o0), loss
                upd, o1 = trainer.tx.update(grads, o0, p0)
                return (jax.tree.map(lambda a, u: a + u, p0, upd), o1), loss

            (p1, o1), losses = jax.lax.scan(
                body, (params, opt_state), {"i": xi, "f": xf}
            )
            return p1, o1, losses.sum()

        return epoch

    for mode in ("fwd", "grad", "full"):
        ep = make_epoch(mode)
        p1, o1, s = ep(params, opt_state, int_mat, flt_mat, jax.random.PRNGKey(0))
        hard_sync(p1)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            p1, o1, s = ep(
                params, opt_state, int_mat, flt_mat, jax.random.PRNGKey(i + 1)
            )
            hard_sync(p1)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        print(
            f"{mode:<5} {best/steps*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
