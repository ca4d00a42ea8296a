"""ALS collaborative filtering — the classic-model baseline.

Rebuild of `offline/spark/model/CollaborativeFiltering.scala` (and the
PySpark mirror): Spark ML `ALS(maxIter=5, regParam=0.01, rank=10,
coldStartStrategy="drop")` on an 80/20 random split, RMSE via
`RegressionEvaluator` (scala:72-77), `recommendForAllUsers/Items(10)` +
subset variants (scala:80-95), and a `CrossValidator(numFolds=10)` harness
(scala:98-112).

TPU-native design: each half-iteration solves ALL users' (or items')
k x k normal equations as ONE batched `jnp.linalg.solve` — Gram matrices
assembled with `segment_sum` over the rating triples (dense [N, k, k]
outer products), no per-user Python. Regularization uses Spark's ALS-WR
scaling (lambda * n_ratings per row). The whole iteration is jittable;
recommend_for_all = factor matmul + `lax.top_k` on device.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.data.movielens import Ratings


@dataclasses.dataclass(frozen=True)
class ALSConfig:
    rank: int = 10          # Spark ALS default
    max_iter: int = 5       # CollaborativeFiltering.scala:53
    reg_param: float = 0.01 # scala:54
    seed: int = 2024


@dataclasses.dataclass
class ALSModel:
    user_ids: np.ndarray     # [U] external ids
    item_ids: np.ndarray     # [I]
    user_factors: np.ndarray # [U, k]
    item_factors: np.ndarray # [I, k]

    def _rows(self, ids: np.ndarray, ext: np.ndarray) -> np.ndarray:
        # ids come sorted from np.unique; vectorized membership via
        # searchsorted (a Python dict per call is ~100x slower at the
        # 20M-event scale tools/als_scale.py drives).
        if len(ids) == 0:
            return np.full(len(ext), -1, np.int64)
        idx = np.searchsorted(ids, ext)
        idx = np.minimum(idx, len(ids) - 1)
        return np.where(ids[idx] == ext, idx, -1).astype(np.int64)

    def predict(self, user_ids: np.ndarray, item_ids: np.ndarray) -> np.ndarray:
        """Dot-product predictions; NaN for unseen users/items (Spark's
        pre-"drop" behaviour; `transform_drop` filters them)."""
        u = self._rows(self.user_ids, user_ids)
        i = self._rows(self.item_ids, item_ids)
        ok = (u >= 0) & (i >= 0)
        out = np.full(len(u), np.nan, np.float32)
        if ok.any():
            out[ok] = np.einsum(
                "nd,nd->n",
                self.user_factors[u[ok]],
                self.item_factors[i[ok]],
            )
        return out

    def transform_drop(
        self, ratings: Ratings
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(predictions, actuals) with cold-start rows dropped
        (`model.setColdStartStrategy("drop")`, scala:63)."""
        pred = self.predict(ratings.user_ids, ratings.movie_ids)
        keep = ~np.isnan(pred)
        return pred[keep], ratings.ratings[keep]

    def rmse(self, ratings: Ratings) -> float:
        pred, actual = self.transform_drop(ratings)
        if len(pred) == 0:
            return float("nan")
        return float(np.sqrt(np.mean((pred - actual) ** 2)))

    def recommend_for_all_users(self, k: int = 10) -> Dict[int, list]:
        """Top-k unseen-agnostic recommendations (Spark parity: scores over
        ALL items, no watched-filter) — one matmul + top_k on device."""
        scores = jnp.dot(
            jnp.asarray(self.user_factors), jnp.asarray(self.item_factors).T,
            preferred_element_type=jnp.float32,
        )
        s, idx = jax.lax.top_k(scores, min(k, len(self.item_ids)))
        s, idx = np.asarray(s), np.asarray(idx)
        return {
            int(u): [(int(self.item_ids[j]), float(v)) for j, v in zip(row, sv)]
            for u, row, sv in zip(self.user_ids, idx, s)
        }

    def recommend_for_all_items(self, k: int = 10) -> Dict[int, list]:
        scores = jnp.dot(
            jnp.asarray(self.item_factors), jnp.asarray(self.user_factors).T,
            preferred_element_type=jnp.float32,
        )
        s, idx = jax.lax.top_k(scores, min(k, len(self.user_ids)))
        s, idx = np.asarray(s), np.asarray(idx)
        return {
            int(i): [(int(self.user_ids[j]), float(v)) for j, v in zip(row, sv)]
            for i, row, sv in zip(self.item_ids, idx, s)
        }

    def recommend_for_user_subset(self, users, k: int = 10) -> Dict[int, list]:
        all_recs = self.recommend_for_all_users(k)
        return {int(u): all_recs[int(u)] for u in users if int(u) in all_recs}


#: Above this many ratings the [N, k*k] outer-product temporary would
#: blow HBM; accumulate the normal equations chunk-at-a-time instead
#: (same lax.scan pattern as the device feature pipeline's genre stage).
#: 4M x 100 fp32 pads to 4M x 128 = 2 GB peak per chunk.
ALS_CHUNK_EVENTS = 4_000_000


def _outer2d(f: jnp.ndarray) -> jnp.ndarray:
    """Row-wise outer products flattened to [N, k*k]. A [N, k, k] shape
    would tile-pad to (8, 128) on the LAST TWO dims on TPU — 20x memory
    at rank 10 (measured: f32[4M,10,10] allocates 32.7 GB) — so the k x k
    plane stays flattened until after the segment reduction."""
    k = f.shape[1]
    ia = jnp.repeat(jnp.arange(k), k)
    ib = jnp.tile(jnp.arange(k), k)
    return f[:, ia] * f[:, ib]


@functools.partial(jax.jit, static_argnames=("n_rows",))
def _solve_side(
    fixed: jnp.ndarray,       # [M, k] fixed-side factors
    row_idx: jnp.ndarray,     # [N] target-side row per rating
    col_idx: jnp.ndarray,     # [N] fixed-side row per rating
    values: jnp.ndarray,      # [N] ratings
    reg: float,
    n_rows: int,
) -> jnp.ndarray:
    """Solve all target rows' normal equations in one batched solve:
    A_r = Σ f_c f_c^T + reg * n_r * I,  b_r = Σ v f_c.
    """
    k = fixed.shape[1]
    f = jnp.take(fixed, col_idx, axis=0)                     # [N, k]
    gram = jax.ops.segment_sum(_outer2d(f), row_idx, n_rows)  # [R, k*k]
    rhs = jax.ops.segment_sum(values[:, None] * f, row_idx, n_rows)
    counts = jax.ops.segment_sum(jnp.ones_like(values), row_idx, n_rows)
    return _solve_rows(gram.reshape(n_rows, k, k), rhs, counts, reg, fixed.dtype)


def _solve_rows(gram, rhs, counts, reg, dtype):
    k = gram.shape[-1]
    eye = jnp.eye(k, dtype=dtype)
    # ALS-WR: lambda scaled by each row's rating count (Spark semantics);
    # empty rows get identity systems -> zero solution via zero rhs.
    a = gram + (reg * jnp.maximum(counts, 1.0))[:, None, None] * eye
    return jnp.linalg.solve(a, rhs[:, :, None])[:, :, 0]


@functools.partial(jax.jit, static_argnames=("n_rows", "n_chunks"))
def _solve_side_chunked(
    fixed: jnp.ndarray,
    row_idx: jnp.ndarray,     # [C * chunk] (tail padded, values masked 0)
    col_idx: jnp.ndarray,
    values: jnp.ndarray,
    valid: jnp.ndarray,       # [C * chunk] 0/1 padding mask
    reg: float,
    n_rows: int,
    n_chunks: int,
) -> jnp.ndarray:
    """Same math as `_solve_side`, accumulating (gram, rhs, counts) over
    event chunks so the [chunk, k, k] outer products bound peak HBM.
    Bit-comparable up to f32 summation order."""
    k = fixed.shape[1]
    shape = (n_chunks, -1)
    xs = (
        row_idx.reshape(shape), col_idx.reshape(shape),
        values.reshape(shape), valid.reshape(shape),
    )
    init = (
        jnp.zeros((n_rows, k * k), fixed.dtype),  # flat: see _outer2d
        jnp.zeros((n_rows, k), fixed.dtype),
        jnp.zeros((n_rows,), fixed.dtype),
    )

    def body(carry, x):
        gram, rhs, counts = carry
        ri, ci, v, m = x
        f = jnp.take(fixed, ci, axis=0) * m[:, None]         # padded -> 0
        gram = gram + jax.ops.segment_sum(_outer2d(f), ri, n_rows)
        rhs = rhs + jax.ops.segment_sum((v * m)[:, None] * f, ri, n_rows)
        counts = counts + jax.ops.segment_sum(m, ri, n_rows)
        return (gram, rhs, counts), None

    (gram, rhs, counts), _ = jax.lax.scan(body, init, xs)
    return _solve_rows(gram.reshape(n_rows, k, k), rhs, counts, reg, fixed.dtype)


def train_als(ratings: Ratings, config: ALSConfig = ALSConfig()) -> ALSModel:
    user_ids, u_idx = np.unique(ratings.user_ids, return_inverse=True)
    item_ids, i_idx = np.unique(ratings.movie_ids, return_inverse=True)
    n_u, n_i = len(user_ids), len(item_ids)
    k = config.rank

    key = jax.random.PRNGKey(config.seed)
    ku, ki = jax.random.split(key)
    # Spark initializes with abs(normal)/sqrt(rank) scaled uniforms; any
    # small positive init converges identically for this problem size.
    uf = jax.random.uniform(ku, (n_u, k), jnp.float32, 0.0, 1.0) / np.sqrt(k)
    vf = jax.random.uniform(ki, (n_i, k), jnp.float32, 0.0, 1.0) / np.sqrt(k)

    n = len(ratings)
    if n > ALS_CHUNK_EVENTS:
        n_chunks = -(-n // ALS_CHUNK_EVENTS)
        pad = n_chunks * ALS_CHUNK_EVENTS - n
        u_idx_j = jnp.asarray(np.pad(u_idx, (0, pad)).astype(np.int32))
        i_idx_j = jnp.asarray(np.pad(i_idx, (0, pad)).astype(np.int32))
        vals = jnp.asarray(
            np.pad(ratings.ratings.astype(np.float32), (0, pad))
        )
        valid = jnp.asarray(
            np.pad(np.ones(n, np.float32), (0, pad))
        )
        for _ in range(config.max_iter):
            uf = _solve_side_chunked(
                vf, u_idx_j, i_idx_j, vals, valid,
                config.reg_param, n_u, n_chunks,
            )
            vf = _solve_side_chunked(
                uf, i_idx_j, u_idx_j, vals, valid,
                config.reg_param, n_i, n_chunks,
            )
        return ALSModel(user_ids, item_ids, np.asarray(uf), np.asarray(vf))

    u_idx_j = jnp.asarray(u_idx)
    i_idx_j = jnp.asarray(i_idx)
    vals = jnp.asarray(ratings.ratings, jnp.float32)

    for _ in range(config.max_iter):
        uf = _solve_side(vf, u_idx_j, i_idx_j, vals, config.reg_param, n_u)
        vf = _solve_side(uf, i_idx_j, u_idx_j, vals, config.reg_param, n_i)

    return ALSModel(user_ids, item_ids, np.asarray(uf), np.asarray(vf))


def main() -> None:
    """`CollaborativeFiltering.main` parity: 80/20 split, train, RMSE,
    factor peek, all-users/all-items top-10 recs, subset recs, 10-fold CV."""
    import argparse

    from sparrowrecsys_tpu.config import DataConfig
    from sparrowrecsys_tpu.data.movielens import load_ratings

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--cv", action="store_true")
    args = ap.parse_args()
    data = DataConfig() if args.data_root is None else DataConfig(data_root=args.data_root)
    ratings = load_ratings(data.path(data.ratings_csv))

    rng = np.random.default_rng(2024)
    mask = rng.random(len(ratings)) < 0.8
    tr = Ratings(ratings.user_ids[mask], ratings.movie_ids[mask],
                 ratings.ratings[mask], ratings.timestamps[mask])
    te = Ratings(ratings.user_ids[~mask], ratings.movie_ids[~mask],
                 ratings.ratings[~mask], ratings.timestamps[~mask])
    model = train_als(tr)
    print("itemFactors (first 3):")
    for i in range(min(3, len(model.item_ids))):
        print(" ", int(model.item_ids[i]), np.round(model.item_factors[i], 3))
    print(f"Root-mean-square error = {model.rmse(te)}")
    user_recs = model.recommend_for_all_users(10)
    item_recs = model.recommend_for_all_items(10)
    some_users = list(user_recs)[:3]
    print("userSubsetRecs:", {u: user_recs[u][:3] for u in some_users})
    print(f"({len(user_recs)} users, {len(item_recs)} items with recs)")
    if args.cv:
        cv = cross_validate(te, num_folds=10)
        print(f"Cross-validated metrics: {cv}")


def cross_validate(
    ratings: Ratings,
    config: ALSConfig = ALSConfig(),
    reg_grid=(0.01,),
    num_folds: int = 10,
    seed: int = 2024,
) -> Dict[float, float]:
    """`CrossValidator(numFolds=10)` over a regParam grid (scala:98-112):
    mean held-out RMSE per grid point."""
    rng = np.random.default_rng(seed)
    n = len(ratings)
    fold = rng.integers(0, num_folds, n)
    out: Dict[float, float] = {}
    for reg in reg_grid:
        cfg = dataclasses.replace(config, reg_param=reg)
        scores = []
        for f in range(num_folds):
            tr, te = fold != f, fold == f
            model = train_als(
                Ratings(
                    ratings.user_ids[tr], ratings.movie_ids[tr],
                    ratings.ratings[tr], ratings.timestamps[tr],
                ),
                cfg,
            )
            scores.append(
                model.rmse(
                    Ratings(
                        ratings.user_ids[te], ratings.movie_ids[te],
                        ratings.ratings[te], ratings.timestamps[te],
                    )
                )
            )
        out[reg] = float(np.nanmean(scores))
    return out


if __name__ == "__main__":
    main()
