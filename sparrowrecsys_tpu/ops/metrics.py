"""Streaming and exact binary-classification metrics.

The reference compiles every model with accuracy + ROC-AUC + PR-AUC
(`TFRecModel/.../EmbeddingMLP.py:87-90` — `tf.keras.metrics.AUC(curve='ROC')`
and `AUC(curve='PR')`) and prints test loss/accuracy/AUCs after `evaluate`
(`EmbeddingMLP.py:96-98`). Keras's AUC is a 200-threshold streaming
approximation; we provide the same thresholded streaming metric (jit-friendly
accumulate on device) plus exact sort-based AUCs for evaluation.

All streaming state is a small fixed-shape array pytree, so it composes with
`jax.jit` / `pjit` (accumulate with a `psum` across data shards).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_THRESHOLDS = 200  # tf.keras.metrics.AUC default


class MetricState(NamedTuple):
    """Streaming confusion-matrix state at NUM_THRESHOLDS thresholds."""

    tp: jnp.ndarray  # [T]
    fp: jnp.ndarray  # [T]
    loss_sum: jnp.ndarray  # []
    correct: jnp.ndarray  # []
    pos: jnp.ndarray  # [] total positives
    neg: jnp.ndarray  # [] total negatives
    count: jnp.ndarray  # [] total examples


def _thresholds() -> jnp.ndarray:
    # Keras: [-eps, k/(T-1)... , 1+eps] — equally spaced in (0,1) plus sentinels.
    t = NUM_THRESHOLDS
    inner = (jnp.arange(t - 2, dtype=jnp.float32) + 1.0) / jnp.float32(t - 1)
    return jnp.concatenate(
        [jnp.array([-1e-7], jnp.float32), inner, jnp.array([1.0 + 1e-7], jnp.float32)]
    )


def init_metrics() -> MetricState:
    t = NUM_THRESHOLDS
    # NB: five *distinct* scalar buffers — sharing one array object breaks
    # buffer donation in the jitted train step (same buffer donated twice).
    return MetricState(
        tp=jnp.zeros((t,), jnp.float32),
        fp=jnp.zeros((t,), jnp.float32),
        loss_sum=jnp.zeros((), jnp.float32),
        correct=jnp.zeros((), jnp.float32),
        pos=jnp.zeros((), jnp.float32),
        neg=jnp.zeros((), jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def update_metrics(
    state: MetricState,
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    loss_sum: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> MetricState:
    """Accumulate one batch. probs/labels [B] float32; mask [B] or None.

    jit-safe: fixed shapes, no data-dependent control flow.
    """
    if mask is None:
        mask = jnp.ones_like(probs)
    labels = labels.astype(jnp.float32) * mask
    th = _thresholds()
    pred_pos = (probs[None, :] > th[:, None]).astype(jnp.float32) * mask[None, :]
    tp = jnp.sum(pred_pos * labels[None, :], axis=1)
    fp = jnp.sum(pred_pos * (mask - labels)[None, :], axis=1)
    correct = jnp.sum(((probs > 0.5).astype(jnp.float32) == labels) * mask)
    return MetricState(
        tp=state.tp + tp,
        fp=state.fp + fp,
        loss_sum=state.loss_sum + loss_sum,
        correct=state.correct + correct,
        pos=state.pos + jnp.sum(labels),
        neg=state.neg + jnp.sum(mask - labels),
        count=state.count + jnp.sum(mask),
    )


@jax.jit
def finalize_metrics(state: MetricState) -> Dict[str, jnp.ndarray]:
    """Compute loss/accuracy/ROC-AUC/PR-AUC from streaming state.

    ROC-AUC: trapezoidal over (FPR, TPR) — Keras `summation_method=
    'interpolation'` for curve='ROC'. PR-AUC: Keras uses Davis-Goadrich-style
    interpolation; we use the same interpolated precision integral.
    """
    eps = 1e-7
    tpr = state.tp / jnp.maximum(state.pos, eps)
    fpr = state.fp / jnp.maximum(state.neg, eps)
    # Thresholds ascend => tpr/fpr descend; integrate descending curves.
    roc_auc = jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) * 0.5)

    # PR interpolation (Keras interpolate_pr_auc, Davis & Goadrich 2006).
    tp, fp = state.tp, state.fp
    dtp = tp[:-1] - tp[1:]
    p = tp + fp
    dp = p[:-1] - p[1:]
    prec_slope = dtp / jnp.maximum(dp, eps)
    intercept = tp[1:] - prec_slope * p[1:]
    safe_p_ratio = jnp.where(
        (p[:-1] > 0) & (p[1:] > 0),
        jnp.log(jnp.maximum(p[:-1], eps) / jnp.maximum(p[1:], eps)),
        jnp.zeros_like(p[1:]),
    )
    pr_auc = jnp.sum(
        prec_slope * (dtp + intercept * safe_p_ratio) / jnp.maximum(state.pos, eps)
    )
    return {
        "loss": state.loss_sum / jnp.maximum(state.count, eps),
        "accuracy": state.correct / jnp.maximum(state.count, eps),
        "roc_auc": roc_auc,
        "pr_auc": pr_auc,
    }


def exact_auc(probs: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Exact ROC-AUC (Mann-Whitney) and PR-AUC (average precision) on host.

    Used for evaluation parity checks where the 200-threshold approximation
    would add avoidable noise.
    """
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels, np.float64)
    order = np.argsort(-probs, kind="stable")
    y = labels[order]
    pos = y.sum()
    neg = len(y) - pos
    if pos == 0 or neg == 0:
        return {"roc_auc": float("nan"), "pr_auc": float("nan")}
    # ROC via the Mann-Whitney rank statistic, ties -> average rank.
    # Ranks are over *descending* probs: AUC = (P*N + P(P+1)/2 - R+) / (P*N)
    # where R+ = sum of descending ranks of positives.
    sorted_p = probs[order]
    n = len(probs)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = sorted_p[1:] != sorted_p[:-1]
    group = np.cumsum(boundary) - 1
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, n))
    avg_rank = starts + (sizes + 1) / 2.0  # mean of ranks (1-based) per group
    ranks = avg_rank[group]
    pos_ranks = ranks[y == 1].sum()
    roc = (pos * neg + pos * (pos + 1) / 2 - pos_ranks) / (pos * neg)
    # PR-AUC as average precision (step-wise integral).
    tp = np.cumsum(y)
    precision = tp / np.arange(1, len(y) + 1)
    ap = (precision * y).sum() / pos
    return {"roc_auc": float(roc), "pr_auc": float(ap)}
