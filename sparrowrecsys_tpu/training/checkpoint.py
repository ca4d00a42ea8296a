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


def load_latest(model_dir: str, target: Any) -> Tuple[Any, int, dict]:
    """Restore the highest version into `target`'s pytree structure.
    Returns (params, version, meta)."""
    versions = _versions(model_dir)
    if not versions:
        raise FileNotFoundError(f"no checkpoint versions under {model_dir}")
    v = versions[-1]
    vdir = os.path.join(model_dir, f"{v:03d}")
    with open(os.path.join(vdir, "params.msgpack"), "rb") as f:
        params = flax.serialization.from_bytes(target, f.read())
    meta = {}
    meta_path = os.path.join(vdir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, v, meta
