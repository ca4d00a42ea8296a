"""A/B: DeepFM v2 per-field projections as one block-diagonal matmul.

LANDED (models/deepfm.py::DeepFMv2 now folds; measured 5.505 vs 5.719
ms/step, +3.9%, v5e batch 65536): five nn.Dense(64) field projections
(K = 10/10/10/10/7) are five MXU-lane-padded matmuls; folding them into
concat(x_fields) [B, 47] @ block-diag(W) [47, 320] is one matmul + five
tiny dynamic-update-slices (same lesson as tools/din_exp.py /
tools/augru_exp.py). LinParams creates params under the SAME paths with
nn.Dense's default inits, so the landing preserved seed-pinned init and
checkpoints bitwise (asserted: identical param trees + max|dlogit| = 0).
This tool keeps the pre-fold per-field variant for re-measure;
"folded" is the production model.

    python tools/fold_exp.py
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import (
    EMBEDDING_DIM,
    MOVIE_VOCAB_SIZE,
    TrainConfig,
    USER_VOCAB_SIZE,
)
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.models.deepfm import DeepFMv2
from sparrowrecsys_tpu.models.features import (
    GenreEmbed,
    IdBias,
    IdEmbed,
    compute_dtype,
    merged_embed_bias,
    numeric_stack,
)
from sparrowrecsys_tpu.ops import metrics as M
from sparrowrecsys_tpu.ops.fm import fm_cross
from sparrowrecsys_tpu.training.loop import Trainer, hard_sync
from tools.zoo_bench import BATCH, STEPS, gen_epoch_fn


class DeepFMv2PerField(DeepFMv2):
    """The pre-fold round-1 form: five separate nn.Dense projections."""

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        item, b_item = merged_embed_bias(
            IdEmbed(self.movie_buckets, self.dim, name="emb_movieId")(None),
            IdBias(self.movie_buckets, name="bias_movieId")(None),
            features["movieId"],
        )
        user, b_user = merged_embed_bias(
            IdEmbed(self.user_buckets, self.dim, name="emb_userId")(None),
            IdBias(self.user_buckets, name="bias_userId")(None),
            features["userId"],
        )
        item_genre, b_mg = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_movieGenre1")(None),
            IdBias(19, name="bias_movieGenre1")(None),
            features["movieGenre1"],
        )
        user_genre, b_ug = merged_embed_bias(
            GenreEmbed(dim=self.dim, name="emb_userGenre1")(None),
            IdBias(19, name="bias_userGenre1")(None),
            features["userGenre1"],
        )
        numerics = numeric_stack(features)

        first = (
            b_item + b_user + b_ug + b_mg
            + nn.Dense(1, name="first_deep")(numerics)[..., 0]
        )

        fields = jnp.stack(
            [
                nn.Dense(self.field_dim, name="proj_itemGenre")(item_genre),
                nn.Dense(self.field_dim, name="proj_item")(item),
                nn.Dense(self.field_dim, name="proj_userGenre")(user_genre),
                nn.Dense(self.field_dim, name="proj_user")(user),
                nn.Dense(self.field_dim, name="proj_numeric")(numerics),
            ],
            axis=1,
        )

        fm = fm_cross(fields)

        dt = compute_dtype(self.compute_dtype)
        deep = fields.reshape(fields.shape[0], -1)
        deep = nn.relu(nn.Dense(32, dtype=dt, name="deep1")(deep))
        deep = nn.relu(nn.Dense(16, dtype=dt, name="deep2")(deep))
        deep = deep.astype(jnp.float32)

        x = jnp.concatenate([first[:, None], fm, deep], axis=-1)
        return nn.Dense(1, name="out")(x)[..., 0]


def main() -> None:
    print("backend:", jax.devices()[0].platform, flush=True)
    n = BATCH * STEPS
    data, labels_d = gen_epoch_fn(n, dien=False)(jax.random.PRNGKey(0))
    sample_host = {
        k: np.zeros((2,), np.int32 if v.dtype == jnp.int32 else np.float32)
        for k, v in data.items()
    }
    variants = {
        "separate": DeepFMv2PerField(),
        "folded": build_model("deepfm_v2"),
    }
    runs = {}
    for name, model in variants.items():
        tr = Trainer(model, TrainConfig(batch_size=BATCH, epochs=1))
        tr._build_steps()
        params = tr.init_params(sample_host)
        carry = tr._train_epoch(
            *(params, tr.tx.init(params), M.init_metrics()),
            data, labels_d, jax.random.PRNGKey(0),
            n=n, batch_size=BATCH, shuffle=True,
        )
        hard_sync(carry[0])
        runs[name] = (tr, carry)
    best = {name: float("inf") for name in variants}
    for i in range(3):
        for name in variants:
            tr, carry = runs[name]
            t0 = time.perf_counter()
            carry = tr._train_epoch(
                *carry, data, labels_d, jax.random.PRNGKey(i + 1),
                n=n, batch_size=BATCH, shuffle=True,
            )
            hard_sync(carry[0])
            best[name] = min(best[name], time.perf_counter() - t0)
            runs[name] = (tr, carry)
    for name, b in best.items():
        print(
            f"{name:<9} {b/STEPS*1e3:7.3f} ms/step {n/b/1e6:7.2f}M ex/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
