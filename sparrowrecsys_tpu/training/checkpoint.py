"""Versioned model checkpoints.

Reproduces the reference's model-versioning convention — numbered
SavedModel dirs consumed by TF Serving (`modeldata/neuralcf/001..002`,
export at `NeuralCF.py:106-114`) — with flax msgpack serialization:

    <dir>/<NNN>/params.msgpack + meta.json

`save` allocates the next version (or overwrites an explicit one);
`load_latest` restores the highest version, which is exactly TF Serving's
serving-version policy.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import flax.serialization

_VERSION_RE = re.compile(r"^\d{3,}$")


def _versions(model_dir: str):
    if not os.path.isdir(model_dir):
        return []
    return sorted(
        int(d) for d in os.listdir(model_dir) if _VERSION_RE.match(d)
    )


def save(
    params: Any,
    model_dir: str,
    version: Optional[int] = None,
    meta: Optional[dict] = None,
    keep: Optional[int] = None,
) -> str:
    """Serialize params into the next (or given) numbered version dir.
    `keep` prunes to the newest N versions (TrainConfig.checkpoint_keep)."""
    existing = _versions(model_dir)
    if version is None:
        version = (existing[-1] + 1) if existing else 1
    vdir = os.path.join(model_dir, f"{version:03d}")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump(meta or {}, f)
    if keep:
        for v in _versions(model_dir)[:-keep]:
            import shutil

            shutil.rmtree(os.path.join(model_dir, f"{v:03d}"), ignore_errors=True)
    return vdir


def latest_ready_version(model_dir: str) -> Optional[int]:
    """Newest version whose export is COMPLETE (meta.json present —
    `save()` writes it last, so its existence marks the params file as
    fully written). This is the readiness test the hot-reload watcher
    polls with, mirroring TF Serving's filesystem version policy
    (`RecForYouProcess.java:139` relies on it): a half-written NNN/ dir
    must not be served."""
    for v in reversed(_versions(model_dir)):
        vdir = os.path.join(model_dir, f"{v:03d}")
        if os.path.exists(os.path.join(vdir, "meta.json")) and os.path.exists(
            os.path.join(vdir, "params.msgpack")
        ):
            return v
    return None


def load_version(model_dir: str, version: int, target: Any) -> Tuple[Any, dict]:
    """Restore one specific numbered version into `target`'s structure."""
    vdir = os.path.join(model_dir, f"{version:03d}")
    with open(os.path.join(vdir, "params.msgpack"), "rb") as f:
        params = flax.serialization.from_bytes(target, f.read())
    meta = {}
    meta_path = os.path.join(vdir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta


def load_latest(model_dir: str, target: Any) -> Tuple[Any, int, dict]:
    """Restore the highest version into `target`'s pytree structure.
    Returns (params, version, meta)."""
    versions = _versions(model_dir)
    if not versions:
        raise FileNotFoundError(f"no checkpoint versions under {model_dir}")
    v = versions[-1]
    params, meta = load_version(model_dir, v, target)
    return params, v, meta


# ---- full train-state checkpoint/resume ---------------------------------
#
# The reference's training scripts are fire-and-forget (SURVEY.md §5:
# "training scripts have none"); model *versioning* is its only artifact
# policy. A production trainer needs mid-training resume: params alone
# are not enough — Adam moments and the epoch cursor must round-trip, and
# because the per-epoch shuffle key is derived as PRNGKey(seed + epoch),
# a resumed run replays the exact same batch schedule the uninterrupted
# run would have used (asserted bitwise in tests/test_checkpoint.py).

class NotATrainStateError(RuntimeError):
    """The newest version dir holds a params-only export (no optimizer
    state) — resuming from it would mean a silent cold start."""


def save_train_state(
    params: Any,
    opt_state: Any,
    next_epoch: int,
    state_dir: str,
    keep: Optional[int] = None,
    extra_meta: Optional[dict] = None,
) -> str:
    """Checkpoint the full train state under a numbered version dir:
    <state_dir>/<NNN>/{params.msgpack, opt_state.msgpack, meta.json}."""
    meta = dict(extra_meta or {})
    meta["next_epoch"] = int(next_epoch)
    vdir = save(params, state_dir, meta=meta, keep=keep)
    with open(os.path.join(vdir, "opt_state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(opt_state))
    return vdir


def load_latest_train_state(
    state_dir: str, params_target: Any, opt_state_target: Any
) -> Tuple[Any, Any, int, dict]:
    """Restore (params, opt_state, next_epoch, meta) from the newest
    version. `opt_state_target` supplies the optimizer pytree structure
    (e.g. `tx.init(params_target)`)."""
    params, v, meta = load_latest(state_dir, params_target)
    vdir = os.path.join(state_dir, f"{v:03d}")
    opt_path = os.path.join(vdir, "opt_state.msgpack")
    if not os.path.exists(opt_path):
        # Deliberately NOT FileNotFoundError: callers treat that as "no
        # checkpoint yet -> cold start", but a params-only export under a
        # --state-dir is a misconfiguration that must surface, not
        # silently restart training from scratch.
        raise NotATrainStateError(
            f"{vdir} has no opt_state.msgpack — it is a params-only export, "
            "not a train-state checkpoint"
        )
    with open(opt_path, "rb") as f:
        opt_state = flax.serialization.from_bytes(opt_state_target, f.read())
    return params, opt_state, int(meta.get("next_epoch", 0)), meta
