"""Experiment 7: epoch-shuffle restructurings vs the per-step row gather.

Post packed-gather (BASELINE.md round-2), the scan body still gathers
batch rows from the packed [N, C] matrices with a random index vector
every step. On TPU a random row gather reads a whole (8, 128) tile per
requested ~100 B row (~40x read amplification); per step at batch 65536
that is ~0.5 GB of wasted HBM traffic. Two restructurings, both one
dispatch per epoch:

  a) ``prepermute`` — apply the full permutation ONCE to the packed
     matrices before the scan, reshape to [steps, batch, C], and feed
     them as scan xs (contiguous dynamic-slice per step). Identical
     statistics to the current shuffle; same total gather bytes but all
     amplification paid once outside the step's critical path.
  b) ``blocks`` — permute fixed 1024-row blocks instead of rows: the
     gather becomes contiguous 112 KB block reads (no tile waste). An
     APPROXIMATE shuffle — but so is the reference's
     `make_csv_dataset` 10k-row buffer shuffle
     (TFRecModel/.../EmbeddingMLP.py:14-22); quality must be policed by
     the parity bands before this ever becomes a default.

Control is the current trainer epoch (full row shuffle, in-scan gather).

    python tools/step_exp7.py
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

from __graft_entry__ import _example_features
from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync

BATCH = 65536
STEPS = 16
BLOCK = 1024


def build(batch, steps):
    n = batch * steps
    model = build_model("deepfm")
    feats = _example_features(n)
    labels = (np.random.default_rng(0).random(n) > 0.5).astype(np.float32)
    ds = EncodedDataset(feats, labels)
    trainer = Trainer(model, TrainConfig(batch_size=batch, epochs=1))
    trainer._build_steps()
    params = trainer.init_params(ds.features)
    opt_state = trainer.tx.init(params)
    data = {k: jnp.asarray(v) for k, v in ds.features.items()}
    labels_d = jnp.asarray(ds.labels)
    return trainer, params, opt_state, data, labels_d, n


def pack(data, labels_all):
    int_cols = [k for k, v in data.items() if jnp.issubdtype(v.dtype, jnp.integer)]
    flt_cols = [k for k, v in data.items() if not jnp.issubdtype(v.dtype, jnp.integer)]
    int_mat = jnp.stack([data[k].astype(jnp.int32) for k in int_cols], axis=1)
    flt_mat = jnp.stack(
        [data[k].astype(jnp.float32) for k in flt_cols]
        + [labels_all.astype(jnp.float32)],
        axis=1,
    )
    return int_cols, flt_cols, int_mat, flt_mat


def variant_epoch(trainer, data, labels_d, n, batch, mode):
    """One-dispatch epoch with the chosen shuffle restructuring."""
    steps = n // batch
    int_cols, flt_cols, int_mat, flt_mat = pack(data, labels_d)
    train_step = trainer._train_step.__wrapped__  # unjitted step fn

    def epoch(params, opt_state, mstate, int_mat, flt_mat, key):
        if mode == "prepermute":
            order = jax.random.permutation(key, n).astype(jnp.int32)
            im = jnp.take(int_mat, order, axis=0)
            fm = jnp.take(flt_mat, order, axis=0)
        elif mode == "blocks":
            nb = n // BLOCK
            border = jax.random.permutation(key, nb).astype(jnp.int32)
            im = jnp.take(int_mat.reshape(nb, BLOCK, -1), border, axis=0)
            fm = jnp.take(flt_mat.reshape(nb, BLOCK, -1), border, axis=0)
        else:
            raise ValueError(mode)
        im = im.reshape(steps, batch, -1)
        fm = fm.reshape(steps, batch, -1)
        mask = jnp.ones((batch,), jnp.float32)

        def body(carry, x):
            p, o, m = carry
            irows, frows = x
            feats = {k: irows[:, j] for j, k in enumerate(int_cols)}
            for j, k in enumerate(flt_cols):
                feats[k] = frows[:, j]
            labels = frows[:, -1]
            return train_step(p, o, m, feats, labels, mask), None

        carry, _ = jax.lax.scan(body, (params, opt_state, mstate), (im, fm))
        return carry

    return jax.jit(epoch, donate_argnums=(0, 1, 2)), int_mat, flt_mat


def time_variant(label, run, sync_of):
    run()  # compile
    hard_sync(sync_of())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        hard_sync(sync_of())
        best = min(best, time.perf_counter() - t0)
    n = BATCH * STEPS
    print(f"{label:<22} {best/STEPS*1e3:7.3f} ms/step  {n/best/1e6:7.2f}M ex/s")


def main():
    print("backend:", jax.devices()[0].platform)
    trainer, params, opt_state, data, labels_d, n = build(BATCH, STEPS)
    mstate = M.init_metrics()

    # control: current trainer epoch (in-scan row gather)
    state = {"c": (params, opt_state, mstate)}

    def run_control():
        p, o, m = state["c"]
        state["c"] = trainer._train_epoch(
            p, o, m, data, labels_d, jax.random.PRNGKey(1),
            n=n, batch_size=BATCH, shuffle=True,
        )

    time_variant("control(row-gather)", run_control, lambda: state["c"][0])

    for mode in ("prepermute", "blocks"):
        trainer2, params2, opt2, data2, labels2, _ = build(BATCH, STEPS)
        ep, int_mat, flt_mat = variant_epoch(trainer2, data2, labels2, n, BATCH, mode)
        st = {"c": (params2, opt2, M.init_metrics())}

        def run(ep=ep, st=st, int_mat=int_mat, flt_mat=flt_mat):
            p, o, m = st["c"]
            st["c"] = ep(p, o, m, int_mat, flt_mat, jax.random.PRNGKey(1))

        time_variant(mode, run, lambda st=st: st["c"][0])


if __name__ == "__main__":
    main()
