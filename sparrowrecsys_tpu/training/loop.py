"""Jit-compiled training/evaluation loops.

Replaces the reference's Keras `model.compile(loss='binary_crossentropy',
optimizer='adam', metrics=[accuracy, ROC-AUC, PR-AUC]); model.fit(epochs=5)`
skeleton (`TFRecModel/.../EmbeddingMLP.py:87-98` and mirrors) with a
TPU-native loop:

- one jitted `train_step` (forward + BCE + Adam update + streaming-metric
  accumulation) — no host round-trip per step beyond feeding the batch;
- static shapes: the final partial batch is padded and masked, so one
  compilation serves the whole epoch;
- parity knobs: Adam eps defaults to Keras's 1e-7, batch=12 available as
  `TrainConfig.parity_batch_size`, 5 epochs;
- mesh-aware: params/batches are placed with `parallel.mesh` shardings, so
  the same step scales from 1 chip to a (data, model) mesh — XLA inserts
  the gradient all-reduce and embedding all-gathers.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparrowrecsys_tpu.config import TrainConfig
from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.parallel.mesh import MeshPlan, shard_batch, shard_params


@dataclasses.dataclass
class TrainResult:
    params: Any
    history: list  # per-epoch dicts of train metrics
    eval_metrics: Optional[Dict[str, float]] = None
    examples_per_sec: float = 0.0


def _default_loss(apply_fn, params, feats, labels, mask):
    logits = apply_fn({"params": params}, feats)
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return loss, (logits, jnp.sum(bce * mask))


class Trainer:
    """Generic CTR trainer.

    model: a Flax module whose apply returns logits [B] (or (logits, aux)
    when `loss_fn` is supplied, e.g. DIEN's `dien_loss`).
    """

    def __init__(
        self,
        model,
        config: Optional[TrainConfig] = None,
        plan: Optional[MeshPlan] = None,
        loss_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.config = config or TrainConfig()
        self.plan = plan
        self.loss_fn = loss_fn
        self.tx = optax.adam(
            self.config.learning_rate,
            b1=self.config.adam_b1,
            b2=self.config.adam_b2,
            eps=self.config.adam_eps,
        )
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------------
    def init_params(self, sample_feats: Dict[str, np.ndarray], seed: int = None):
        seed = self.config.seed if seed is None else seed
        feats = {k: jnp.asarray(v[:2]) for k, v in sample_feats.items()}
        params = self.model.init(jax.random.PRNGKey(seed), feats)["params"]
        if self.plan is not None:
            params = shard_params(params, self.plan)
        return params

    # ------------------------------------------------------------------
    def _build_steps(self):
        apply_fn = self.model.apply
        loss_fn = self.loss_fn

        def train_step(params, opt_state, mstate, feats, labels, mask):
            if loss_fn is None:
                (loss, (logits, loss_sum)), grads = jax.value_and_grad(
                    lambda p: _default_loss(apply_fn, p, feats, labels, mask),
                    has_aux=True,
                )(params)
            else:
                (loss, (logits, loss_sum)), grads = jax.value_and_grad(
                    lambda p: loss_fn(apply_fn, p, feats, labels, mask),
                    has_aux=True,
                )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            probs = jax.nn.sigmoid(logits)
            mstate = M.update_metrics(mstate, probs, labels, loss_sum, mask)
            return params, opt_state, mstate

        def eval_step(params, feats):
            out = apply_fn({"params": params}, feats)
            logits = out[0] if isinstance(out, tuple) else out
            return jax.nn.sigmoid(logits)

        donate = (0, 1, 2)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def _batches(self, ds: EncodedDataset, batch_size: int, shuffle: bool, seed: int):
        for feats, labels, mask in ds.batches(
            batch_size, shuffle=shuffle, seed=seed, pad_final=True
        ):
            m = np.ones(len(labels), np.float32) if mask is None else mask
            batch = (
                {k: jnp.asarray(v) for k, v in feats.items()},
                jnp.asarray(labels),
                jnp.asarray(m),
            )
            if self.plan is not None:
                batch = shard_batch(batch, self.plan)
            yield batch

    def fit(
        self,
        train: EncodedDataset,
        test: Optional[EncodedDataset] = None,
        params=None,
        epochs: Optional[int] = None,
        batch_size: Optional[int] = None,
        verbose: bool = True,
    ) -> TrainResult:
        cfg = self.config
        epochs = epochs or cfg.epochs
        batch_size = batch_size or cfg.batch_size
        if self._train_step is None:
            self._build_steps()
        if params is None:
            params = self.init_params(train.features)
        opt_state = self.tx.init(params)

        history = []
        total_examples = 0
        t0 = time.perf_counter()
        for epoch in range(epochs):
            mstate = M.init_metrics()
            for feats, labels, mask in self._batches(
                train, batch_size, cfg.shuffle_each_epoch, cfg.seed + epoch
            ):
                params, opt_state, mstate = self._train_step(
                    params, opt_state, mstate, feats, labels, mask
                )
                total_examples += batch_size
            em = {k: float(v) for k, v in M.finalize_metrics(mstate).items()}
            history.append(em)
            if verbose:
                print(
                    f"epoch {epoch + 1}/{epochs}: loss={em['loss']:.4f} "
                    f"acc={em['accuracy']:.4f} roc_auc={em['roc_auc']:.4f} "
                    f"pr_auc={em['pr_auc']:.4f}"
                )
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0

        eval_metrics = None
        if test is not None:
            eval_metrics = self.evaluate(params, test, batch_size)
            if verbose:
                print(
                    "test: "
                    + " ".join(f"{k}={v:.4f}" for k, v in eval_metrics.items())
                )
        return TrainResult(
            params=params,
            history=history,
            eval_metrics=eval_metrics,
            examples_per_sec=total_examples / max(dt, 1e-9),
        )

    # ------------------------------------------------------------------
    def predict(
        self, params, ds: EncodedDataset, batch_size: Optional[int] = None
    ) -> np.ndarray:
        if self._eval_step is None:
            self._build_steps()
        batch_size = batch_size or self.config.batch_size
        out = []
        for feats, labels, mask in self._batches(ds, batch_size, False, 0):
            probs = self._eval_step(params, feats)
            p = np.asarray(probs)
            if mask is not None:
                p = p[np.asarray(mask) > 0]
            out.append(p)
        return np.concatenate(out) if out else np.empty(0, np.float32)

    def evaluate(
        self, params, ds: EncodedDataset, batch_size: Optional[int] = None
    ) -> Dict[str, float]:
        """Exact (sort-based) eval metrics + mean BCE, like Keras `evaluate`."""
        probs = self.predict(params, ds, batch_size)
        labels = ds.labels[: len(probs)]
        eps = 1e-7
        p = np.clip(probs, eps, 1 - eps)
        bce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
        acc = float(((probs > 0.5) == (labels > 0.5)).mean())
        aucs = M.exact_auc(probs, labels)
        return {"loss": float(bce), "accuracy": acc, **aucs}
