"""Device-resident MovieLens feature engineering — `build_samples` as ONE
jitted XLA program.

The numpy pipeline (`feature_pipeline.build_samples`) replaces the
reference Spark job (`offline/spark/featureeng/FeatureEngForRecModel.scala:
27-142`) with host segment ops; this module moves the same math onto the
accelerator so at production scale (20M+ events) the samples are computed
where training happens and never cross the host boundary: sort, windowed
moments, positive-history chain, genre frequency ranking and top-k are
all XLA ops inside a single dispatch. The trainer's device-resident epoch
(`training/loop.py`) can consume the emitted columns directly.

Numeric-exactness design (TPU has no float64; naive f32 moment sums
would flip the 2-decimal HALF_UP roundings the CSV contract pins):

- ratings live on a 0.5 grid -> carried as `2 * rating` int32; window /
  per-movie sums and sum-of-squares are integer-exact (<= 2e9 < 2^31 at
  20M events).
- release years are carried as `year - YEAR_OFFSET` int32 so windowed
  squares stay <= ~100 * 150^2 << 2^31. Means/stds are shift-invariant
  (std) or shifted back after the divide (mean).
- the only inexactness left is the final f32 divide/sqrt, which matches
  the f64 path everywhere except values within float-epsilon of a
  round-half-up boundary (measured: 0 mismatching rows on the bundled
  22k-event sample; tests/test_device_pipeline.py).

Layout contract matches `feature_pipeline.build_samples` exactly: same
27 columns, same dtypes after host conversion, same
`userRatingCount >= min_user_rating_count` filter.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparrowrecsys_tpu.config import (
    NUMBER_PRECISION,
    POSITIVE_RATING_THRESHOLD,
    USER_FEATURE_WINDOW,
)
from sparrowrecsys_tpu.data.feature_pipeline import _build_genre_tables
from sparrowrecsys_tpu.data.movielens import MovieCatalog, Ratings
from sparrowrecsys_tpu.data.schema import SampleTable

YEAR_OFFSET = 1950  # keeps windowed year squares integer-exact in int32

# Rows per chunk for the genre-frequency stage. Above this the [n, V]
# genre cumsum is computed chunk-at-a-time under lax.map (window-row halo;
# bit-identical, see _genre_topk) so peak HBM stays O(chunk * V) instead
# of O(n * V) — the direct form OOMed a 16 GB v5e at 20M events.
GENRE_CHUNK = 1 << 21


def _round_half_up_scaled(x: jnp.ndarray) -> jnp.ndarray:
    """HALF_UP rounding, returned SCALED by 10^precision (integer-valued
    f32, exact). The final divide happens on the host in float64: XLA
    strength-reduces division-by-constant into multiplication by the
    inexact reciprocal (267 * 0.01 = 2.6699998 != float32(2.67)), which
    would put every rounded value 1 ulp off the numpy pipeline."""
    scale = 10.0 ** NUMBER_PRECISION
    return jnp.sign(x) * jnp.floor(jnp.abs(x) * scale + 0.5)


def _sample_std(count, total, total_sq):
    """Sample (n-1) stddev from integer-exact moment sums (f32 math)."""
    cnt = count.astype(jnp.float32)
    tot = total.astype(jnp.float32)
    var = (total_sq.astype(jnp.float32) - tot * (tot / jnp.maximum(cnt, 1.0))) / (
        jnp.maximum(cnt - 1.0, 1.0)
    )
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.where(count < 2, 0.0, std)


def _genre_window_topk(
    mrow_s: jnp.ndarray,   # int32 [n] catalog row per sorted event, -1 = none
    label_s: jnp.ndarray,  # int32 [n]
    ws: jnp.ndarray,       # int32 [n] window start (sorted coords)
    genre_matrix: jnp.ndarray,  # int32 [M, V] 0/1
    *,
    window: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-5 (count, ext-vocab idx) of positive-window genre frequencies
    per sorted row.

    Direct form materializes three [n, V] temporaries (gather, cumsum,
    window diff) — ~5 GB at 20M events, which OOMs a 16 GB v5e. Beyond
    `chunk` rows the same math runs chunk-at-a-time under lax.map with a
    `window`-row halo: ws >= idx - window guarantees every window start
    falls inside the halo, so per-chunk local cumsum differences equal
    the global gcs[idx] - gcs[ws] exactly (integer math — bit-identical),
    while peak HBM stays O(chunk * V)."""
    n = mrow_s.shape[0]
    V = genre_matrix.shape[1]

    def rows_to_genres(mrow, lab):
        return jnp.where(
            (mrow >= 0)[:, None] & (lab == 1)[:, None],
            genre_matrix[jnp.maximum(mrow, 0)],
            0,
        ).astype(jnp.int32)

    if n <= chunk:
        gcs = jnp.concatenate(
            [
                jnp.zeros((1, V), jnp.int32),
                jnp.cumsum(rows_to_genres(mrow_s, label_s), axis=0,
                           dtype=jnp.int32),
            ]
        )
        idx = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.top_k(gcs[idx] - gcs[ws], 5)

    g = -(-n // chunk)
    pad_tail = g * chunk - n
    # mpad[window + i] = sorted row i; front pad contributes no genres.
    mpad = jnp.concatenate(
        [
            jnp.full((window,), -1, jnp.int32),
            mrow_s,
            jnp.full((pad_tail,), -1, jnp.int32),
        ]
    )
    lpad = jnp.concatenate(
        [jnp.zeros((window,), jnp.int32), label_s,
         jnp.zeros((pad_tail,), jnp.int32)]
    )
    # Tail-pad rows get ws = own index: empty window, rows discarded below.
    wspad = jnp.concatenate(
        [ws, jnp.arange(n, g * chunk, dtype=jnp.int32)]
    )

    def one_chunk(ci):
        start = ci * chunk
        mloc = jax.lax.dynamic_slice(mpad, (start,), (chunk + window,))
        lloc = jax.lax.dynamic_slice(lpad, (start,), (chunk + window,))
        wloc = jax.lax.dynamic_slice(wspad, (start,), (chunk,))
        gcs_l = jnp.concatenate(
            [
                jnp.zeros((1, V), jnp.int32),
                jnp.cumsum(rows_to_genres(mloc, lloc), axis=0,
                           dtype=jnp.int32),
            ]
        )
        j = jnp.arange(chunk, dtype=jnp.int32)
        # global row k maps to local coord k - start + window
        gwin = gcs_l[j + window] - gcs_l[wloc - start + window]
        return jax.lax.top_k(gwin, 5)

    counts, ids = jax.lax.map(one_chunk, jnp.arange(g, dtype=jnp.int32))
    return (
        counts.reshape(g * chunk, 5)[:n],
        ids.reshape(g * chunk, 5)[:n],
    )


@functools.partial(
    jax.jit, static_argnames=("window", "history_length", "genre_chunk")
)
def _device_features(
    uid: jnp.ndarray,           # int32 [n]
    mid: jnp.ndarray,           # int32 [n]
    rating2: jnp.ndarray,       # int32 [n] = 2 * rating (0.5 grid)
    ts: jnp.ndarray,            # int32 [n]
    id_to_row: jnp.ndarray,     # int32 [max_mid + 1], -1 = not in catalog
    release_years: jnp.ndarray, # int32 [M]
    genre_matrix: jnp.ndarray,  # int32 [M, V_ext] 0/1
    movie_genre3: jnp.ndarray,  # int32 [M, 3] model-vocab idx / -1
    ext_to_model: jnp.ndarray,  # int32 [V_ext]
    *,
    window: int,
    history_length: int,
    genre_chunk: int = GENRE_CHUNK,
) -> Dict[str, jnp.ndarray]:
    n = uid.shape[0]
    rating = rating2.astype(jnp.float32) * 0.5
    label = (rating >= POSITIVE_RATING_THRESHOLD).astype(jnp.int32)

    # ---- movie join (scala:46-88) ---------------------------------------
    mrow = id_to_row[jnp.clip(mid, 0, id_to_row.shape[0] - 1)]
    has_movie = (mid >= 0) & (mid < id_to_row.shape[0]) & (mrow >= 0)
    safe_mrow = jnp.where(has_movie, mrow, 0)
    release_year = jnp.where(
        has_movie, release_years[safe_mrow], 1990
    ).astype(jnp.int32)
    # Three separate [n] gathers, NOT movie_genre3[safe_mrow] ([n, 3]):
    # a 2-D int32 with a 3-wide minor dim tile-pads to (8, 128) — 42x the
    # data, a measured 20.5 GB allocation at 40M events (HBM is 16 GB).
    mg = [
        jnp.where(has_movie, movie_genre3[:, j][safe_mrow], -1).astype(
            jnp.int32
        )
        for j in range(3)
    ]

    # Per-movie stats over all rows, grouped by RAW movieId (matches the
    # numpy unique(mid) grouping — ids outside the catalog still count).
    vm = id_to_row.shape[0]
    mid_c = jnp.clip(mid, 0, vm - 1)
    zeros = jnp.zeros((vm,), jnp.int32)
    m_cnt = zeros.at[mid_c].add(1)
    m_tot2 = zeros.at[mid_c].add(rating2)
    m_tot2sq = zeros.at[mid_c].add(rating2 * rating2)
    cnt_r = m_cnt[mid_c]
    tot_r = m_tot2[mid_c].astype(jnp.float32) * 0.5
    totsq_r = m_tot2sq[mid_c].astype(jnp.float32) * 0.25
    movie_avg = _round_half_up_scaled(tot_r / jnp.maximum(cnt_r, 1))
    movie_std = _round_half_up_scaled(_sample_std(cnt_r, tot_r, totsq_r))

    # ---- user windowed features (scala:96-142) --------------------------
    idx = jnp.arange(n, dtype=jnp.int32)
    order = jnp.lexsort((idx, ts, uid)).astype(jnp.int32)
    inv_order = jnp.zeros((n,), jnp.int32).at[order].set(idx)

    uid_s = uid[order]
    mid_s = mid[order]
    rating2_s = rating2[order]
    label_s = label[order]
    yoff_s = (release_year[order] - YEAR_OFFSET).astype(jnp.int32)

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), uid_s[1:] != uid_s[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx, 0))
    ws = jnp.maximum(seg_start, idx - window)
    win_cnt = idx - ws

    def win_sum_i32(x):
        cs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(x, dtype=jnp.int32)]
        )
        return cs[idx] - cs[ws]

    r2_sum = win_sum_i32(rating2_s)
    r2_sq = win_sum_i32(rating2_s * rating2_s)
    y_sum = win_sum_i32(yoff_s)
    y_sq = win_sum_i32(yoff_s * yoff_s)

    fcnt = jnp.maximum(win_cnt, 1).astype(jnp.float32)
    r_sum = r2_sum.astype(jnp.float32) * 0.5
    user_avg_rating = _round_half_up_scaled(
        jnp.where(win_cnt > 0, r_sum / fcnt, 0.0)
    )
    user_avg_year = jnp.where(
        win_cnt > 0, y_sum.astype(jnp.float32) / fcnt + YEAR_OFFSET, 0.0
    )
    # Spark casts avg(releaseYear) to IntegerType: truncation toward zero.
    user_avg_year_i = user_avg_year.astype(jnp.int32)
    user_rating_std = _round_half_up_scaled(
        _sample_std(win_cnt, r_sum, r2_sq.astype(jnp.float32) * 0.25)
    )
    user_year_std = _round_half_up_scaled(
        _sample_std(
            win_cnt, y_sum.astype(jnp.float32), y_sq.astype(jnp.float32)
        )
    )

    # Positive-history chain: k-th most recent positive strictly before i.
    pos_idx = jnp.where(label_s == 1, idx, -1)
    acc = jax.lax.cummax(pos_idx)
    prev_pos = jnp.concatenate([jnp.full((1,), -1, jnp.int32), acc[:-1]])

    hists = []
    cur = prev_pos
    for _ in range(history_length):
        valid = (cur >= seg_start) & (cur >= idx - window) & (cur >= 0)
        h = jnp.where(valid, cur, -1)
        hists.append(h)
        cur = jnp.where(h >= 0, prev_pos[jnp.maximum(h, 0)], -1)
    hist_movies = [
        jnp.where(h >= 0, mid_s[jnp.maximum(h, 0)], 0).astype(jnp.int32)
        for h in hists
    ]

    # Positive-history genre frequency over the window, top-5 by count
    # (ties by vocab index — lax.top_k prefers the lowest index, matching
    # the numpy stable argsort).
    mrow_s = jnp.where(has_movie[order], id_to_row[jnp.clip(mid_s, 0, vm - 1)], -1)
    top5_counts, top5 = _genre_window_topk(
        mrow_s, label_s, ws, genre_matrix, window=window, chunk=genre_chunk
    )
    user_genres = jnp.where(top5_counts > 0, ext_to_model[top5], -1).astype(
        jnp.int32
    )

    back = lambda x: x[inv_order]  # noqa: E731 — sorted -> input order
    cols: Dict[str, jnp.ndarray] = {
        # Integer-exact moment columns. Device f32 divides/sqrts can flip
        # HALF_UP ties vs the numpy pipeline's float64 (measured: 2 rows
        # of 4915 on the bundled sample); the host wrapper recomputes the
        # five float columns from these in f64 — bit-exact by
        # construction. Underscore-prefixed = not part of the 27-column
        # contract.
        "_mTot2": m_tot2[mid_c],
        "_mTot2Sq": m_tot2sq[mid_c],
        "_r2Sum": back(r2_sum),
        "_r2Sq": back(r2_sq),
        "_ySumOff": back(y_sum),
        "_ySqOff": back(y_sq),
        "movieId": mid,
        "userId": uid,
        "rating": rating,
        "timestamp": ts,
        "label": label,
        "releaseYear": release_year,
        "movieGenre1": mg[0],
        "movieGenre2": mg[1],
        "movieGenre3": mg[2],
        "movieRatingCount": cnt_r,
        "movieAvgRating": movie_avg.astype(jnp.float32),
        "movieRatingStddev": movie_std.astype(jnp.float32),
        "userRatingCount": back(win_cnt),
        "userAvgReleaseYear": back(user_avg_year_i),
        "userReleaseYearStddev": back(user_year_std).astype(jnp.float32),
        "userAvgRating": back(user_avg_rating).astype(jnp.float32),
        "userRatingStddev": back(user_rating_std).astype(jnp.float32),
    }
    for j in range(5):
        cols[f"userGenre{j + 1}"] = back(user_genres[:, j])
    for k in range(history_length):
        cols[f"userRatedMovie{k + 1}"] = back(hist_movies[k])
    return cols


def device_feature_columns(
    ratings: Ratings,
    catalog: MovieCatalog,
    window: int = USER_FEATURE_WINDOW,
    history_length: int = 5,
    genre_chunk: int = GENRE_CHUNK,
) -> Dict[str, jnp.ndarray]:
    """Run the jitted pipeline; returns UNFILTERED device columns (use
    `cols["userRatingCount"] >= k` for the reference filter). Timestamps
    are carried int32 (epoch seconds fit until 2038; the host wrapper
    restores int64)."""
    _, genre_matrix, movie_genre3, ext_to_model = _build_genre_tables(catalog)
    mid = ratings.movie_ids.astype(np.int64)
    max_mid = int(max(catalog.movie_ids.max(), mid.max(), 0))
    id_to_row = np.full(max_mid + 1, -1, dtype=np.int32)
    id_to_row[catalog.movie_ids.astype(np.int64)] = np.arange(
        len(catalog), dtype=np.int32
    )
    rating2 = np.round(ratings.ratings.astype(np.float64) * 2.0).astype(np.int32)
    return _device_features(
        jnp.asarray(ratings.user_ids.astype(np.int32)),
        jnp.asarray(mid.astype(np.int32)),
        jnp.asarray(rating2),
        jnp.asarray(ratings.timestamps.astype(np.int32)),
        jnp.asarray(id_to_row),
        jnp.asarray(catalog.release_years.astype(np.int32)),
        jnp.asarray(genre_matrix),
        jnp.asarray(movie_genre3),
        jnp.asarray(ext_to_model),
        window=window,
        history_length=history_length,
        genre_chunk=genre_chunk,
    )


def build_samples_device(
    ratings: Ratings,
    catalog: MovieCatalog,
    window: int = USER_FEATURE_WINDOW,
    min_user_rating_count: int = 2,
    history_length: int = 5,
    genre_chunk: int = GENRE_CHUNK,
) -> SampleTable:
    """Drop-in `build_samples` replacement computed on the accelerator.

    Converts the device columns to host numpy with the numpy pipeline's
    exact dtypes and applies the userRatingCount filter."""
    from sparrowrecsys_tpu.data import feature_pipeline as fp

    dev = device_feature_columns(
        ratings, catalog, window=window, history_length=history_length,
        genre_chunk=genre_chunk,
    )
    host = jax.device_get(dev)
    cols: Dict[str, np.ndarray] = {}
    for k, v in host.items():
        if k.startswith("_"):
            continue
        if k in ("timestamp", "movieRatingCount", "userRatingCount"):
            cols[k] = v.astype(np.int64)
        else:
            cols[k] = v
    # Recompute the float stat columns (and the int-cast year average)
    # from the device's integer-exact moments with the numpy pipeline's
    # exact float64 formulas — bit-identical to build_samples, including
    # HALF_UP tie behaviour that f32 device math can flip.
    m_cnt = cols["movieRatingCount"].astype(np.float64)
    m_tot = host["_mTot2"].astype(np.float64) * 0.5
    m_totsq = host["_mTot2Sq"].astype(np.float64) * 0.25
    cols["movieAvgRating"] = fp._round_half_up(
        m_tot / np.maximum(m_cnt, 1.0)
    ).astype(np.float32)
    cols["movieRatingStddev"] = fp._round_half_up(
        fp._sample_std(m_cnt, m_tot, m_totsq)
    ).astype(np.float32)

    w_cnt = cols["userRatingCount"].astype(np.float64)
    r_sum = host["_r2Sum"].astype(np.float64) * 0.5
    r_sq = host["_r2Sq"].astype(np.float64) * 0.25
    # Reconstruct RAW-year sums from the offset-carried ones so the f64
    # arithmetic sees the same values the numpy pipeline computes.
    y_sum = (
        host["_ySumOff"].astype(np.float64) + w_cnt * YEAR_OFFSET
    )
    y_sq = (
        host["_ySqOff"].astype(np.float64)
        + 2.0 * YEAR_OFFSET * host["_ySumOff"].astype(np.float64)
        + w_cnt * float(YEAR_OFFSET) ** 2
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        uar = np.where(w_cnt > 0, r_sum / np.maximum(w_cnt, 1.0), 0.0)
        uay = np.where(w_cnt > 0, y_sum / np.maximum(w_cnt, 1.0), 0.0)
    cols["userAvgRating"] = fp._round_half_up(uar).astype(np.float32)
    cols["userAvgReleaseYear"] = uay.astype(np.int64).astype(np.int32)
    cols["userRatingStddev"] = fp._round_half_up(
        fp._sample_std(w_cnt, r_sum, r_sq)
    ).astype(np.float32)
    cols["userReleaseYearStddev"] = fp._round_half_up(
        fp._sample_std(w_cnt, y_sum, y_sq)
    ).astype(np.float32)

    keep = cols["userRatingCount"] >= min_user_rating_count
    return SampleTable({k: v[keep] for k, v in cols.items()})


# ---------------------------------------------------------------------------
# Fully device-resident encode: device columns -> EncodedDataset of DEVICE
# arrays, so the 20M-scale path (events -> features -> training) never
# materializes a host table. Replaces the Spark-job -> CSV -> tf.data handoff
# (`FeatureEngForRecModel.scala:195-212` -> `EmbeddingMLP.py:14-22`) with
# arrays that stay in HBM end-to-end.
# ---------------------------------------------------------------------------

#: Stat columns the device carries SCALED by 10^NUMBER_PRECISION
#: (integer-exact HALF_UP; see _round_half_up_scaled).
_SCALED_STAT_COLUMNS = (
    "movieAvgRating",
    "movieRatingStddev",
    "userAvgRating",
    "userRatingStddev",
    "userReleaseYearStddev",
)


@functools.partial(jax.jit, static_argnames=("min_count",))
def _count_kept(user_rating_count: jnp.ndarray, *, min_count: int) -> jnp.ndarray:
    return jnp.sum(user_rating_count >= min_count)


@functools.partial(jax.jit, static_argnames=("min_count", "n_keep"))
def _filter_gather(
    sub: Dict[str, jnp.ndarray],
    user_rating_count: jnp.ndarray,
    *,
    min_count: int,
    n_keep: int,
) -> Dict[str, jnp.ndarray]:
    idx = jnp.nonzero(user_rating_count >= min_count, size=n_keep,
                      fill_value=0)[0]
    return {k: v[idx] for k, v in sub.items()}


def encode_samples_device(
    cols: Dict[str, jnp.ndarray],
    min_user_rating_count: int = 2,
    max_rows: int | None = None,
):
    """`encode_samples(build_samples(...))` without the host round-trip.

    Takes `device_feature_columns` output and returns an EncodedDataset
    whose arrays LIVE ON DEVICE — `Trainer.fit`'s resident epoch consumes
    them directly (its packing/permute path is pure jnp). Exactly two
    dispatches: a scalar kept-row count (the only device->host read) and
    one static-shape filter-gather.

    The five 2-dp stat columns are unscaled on device in f32; vs the host
    pipeline's f64 divide that can differ by 1 ulp on round-half-up ties
    (measured: 2 cells of 4915 x 5 on the bundled sample) — training-
    irrelevant. The CSV/materialized path (`build_samples_device`) stays
    bit-exact.

    `max_rows` keeps the FIRST max_rows kept rows (same semantics as
    `table.select(np.arange(max_rows))` on the host table)."""
    from sparrowrecsys_tpu.data.dataset import (
        EncodedDataset,
        FLOAT_FEATURES,
        GENRE_FEATURES,
        INT_FEATURES,
    )

    n_keep = int(
        _count_kept(cols["userRatingCount"], min_count=min_user_rating_count)
    )
    if max_rows is not None:
        n_keep = min(n_keep, max_rows)

    int_cols = list(INT_FEATURES) + sorted(
        (
            c
            for c in cols
            if c.startswith("userRatedMovie") and c not in INT_FEATURES
        ),
        key=lambda c: int(c[len("userRatedMovie"):]),
    )
    scale = jnp.float32(10.0 ** NUMBER_PRECISION)
    sub: Dict[str, jnp.ndarray] = {}
    for c in int_cols + GENRE_FEATURES:
        sub[c] = cols[c].astype(jnp.int32)
    for c in FLOAT_FEATURES:
        v = cols[c].astype(jnp.float32)
        sub[c] = v / scale if c in _SCALED_STAT_COLUMNS else v
    sub["__label__"] = cols["label"].astype(jnp.float32)

    out = _filter_gather(
        sub,
        cols["userRatingCount"],
        min_count=min_user_rating_count,
        n_keep=n_keep,
    )
    labels = out.pop("__label__")
    return EncodedDataset(out, labels)
