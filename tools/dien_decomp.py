"""What bounds the DIEN train step? (round-2 decomposition)

DIEN is the slowest zoo row (~10 ms/step at batch 65536, BASELINE.md).
Same protocol as tools/step_exp8.py (DeepFM): pre-permuted packed scan
epoch, forced sync, best-of-3 — measured in four modes to attribute the
time between forward CTR path, the auxiliary-loss machinery (GRU-state
x next-click heads over T-1 steps), backward, and Adam:

  fwd_noaux : forward+loss with alpha=0 (XLA DCEs the aux heads)
  fwd       : forward+loss, full two-headed objective
  grad      : + backward (no optimizer)
  full      : + Adam

    python tools/dien_decomp.py        # on the TPU
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
from sparrowrecsys_tpu.models.dien import dien_loss_fn
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=True)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    trainer = Trainer(
        build_model("dien"),
        TrainConfig(batch_size=BATCH, epochs=1),
        loss_fn=dien_loss_fn(),
    )
    trainer._build_steps()
    params = trainer.init_params(sample_host)
    opt_state = trainer.tx.init(params)
    apply_fn = trainer.model.apply

    int_cols = sorted(k for k, v in data.items() if v.dtype == jnp.int32)
    flt_cols = sorted(k for k, v in data.items() if v.dtype != jnp.int32)
    int_mat = jnp.stack([data[k] for k in int_cols], axis=1)
    flt_mat = jnp.stack([data[k] for k in flt_cols] + [labels_d], axis=1)
    steps = n // BATCH

    def make_epoch(mode: str):
        loss_fn = dien_loss_fn(alpha=0.0 if mode == "fwd_noaux" else 0.5)

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

            mask = jnp.ones((BATCH,), jnp.float32)

            if mode.startswith("fwd"):
                def body(carry, x):
                    feats, labels = feats_of(x)
                    out = loss_fn(apply_fn, carry[0], feats, labels, mask)
                    loss = out[0] if isinstance(out, tuple) else out
                    return (carry[0], carry[1] + loss), None

                carry, _ = jax.lax.scan(
                    body, (params, jnp.float32(0.0)), {"i": xi, "f": xf}
                )
                return carry[0], opt_state, carry[1]

            def body(carry, x):
                p0, o0 = carry
                feats, labels = feats_of(x)

                def lf(pp):
                    out = loss_fn(apply_fn, pp, feats, labels, mask)
                    return out[0] if isinstance(out, tuple) else out

                loss, grads = jax.value_and_grad(lf)(p0)
                if mode == "grad":
                    p1 = jax.tree.map(lambda a, g: a - 0.0 * g, p0, grads)
                    return (p1, o0), loss
                upd, o1 = trainer.tx.update(grads, o0, p0)
                return (jax.tree.map(lambda a, u: a + u, p0, upd), o1), loss

            (p1, o1), losses = jax.lax.scan(
                body, (params, opt_state), {"i": xi, "f": xf}
            )
            return p1, o1, losses.sum()

        return epoch

    for mode in ("fwd_noaux", "fwd", "grad", "full"):
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
            f"{mode:<9} {best/steps*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
