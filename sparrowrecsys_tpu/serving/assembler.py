"""Online feature assembly: the full 27-feature serving schema.

The reference documents the complete feature-level TF-Serving request —
all 20 model features per instance — in `HttpClient.java:127-148`, and
exports the per-movie `mf:<id>` / per-user `uf:<id>` Redis hashes to feed
it (`FeatureEngForRecModel.scala:144-192, 239-296`), but its live path
only ever sends {userId, movieId} to NeuralCF
(`RecForYouProcess.java:131-137`). This module completes that loop: given
(user_id, candidate movie_ids) it assembles the zoo's full feature dict
from the serving feature store (with a catalog fallback for the movie
side), encoded EXACTLY as the offline training pipeline encodes samples
(`data.dataset.encode_samples` semantics: genre string -> 19-vocab index
with -1 OOV/missing, history '' -> 0, numerics float) — so any
feature-based CTR model (DeepFM, Wide&Deep, EmbeddingMLP, DIN, DIEN)
can rank online. Online/offline feature consistency is asserted in
tests/test_assembler.py against the pipeline's own encoded rows.

Nearline tie-in: when the `RealTimeFeature`-equivalent stream
(`nearline/stream.py::attach_to_store`) has recorded a fresher positive
behaviour event, the assembler shifts it into `userRatedMovie1` (history
most-recent-first, `FeatureEngForRecModel.scala:99-107`) so the ranking
model sees behaviour the offline snapshot predates.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from sparrowrecsys_tpu.config import GENRE_VOCAB
from sparrowrecsys_tpu.data.schema import HISTORY_COLUMNS
from sparrowrecsys_tpu.serving.feature_store import (
    FeatureStore,
    MOVIE_FEATURE_PREFIX,
    USER_FEATURE_PREFIX,
)

_GENRE_TO_IDX = {g: i for i, g in enumerate(GENRE_VOCAB)}

#: Positive-label threshold (`addSampleLabel`, FeatureEngForRecModel
#: .scala:27-37): only ratings >= 3.5 enter the behaviour history.
_POSITIVE_RATING = 3.5

USER_INT_COLS = tuple(HISTORY_COLUMNS)
USER_GENRE_COLS = ("userGenre1", "userGenre2", "userGenre3", "userGenre4",
                   "userGenre5")
USER_FLOAT_COLS = ("userRatingCount", "userAvgRating", "userRatingStddev",
                   "userAvgReleaseYear", "userReleaseYearStddev")
MOVIE_GENRE_COLS = ("movieGenre1", "movieGenre2", "movieGenre3")
MOVIE_FLOAT_COLS = ("releaseYear", "movieRatingCount", "movieAvgRating",
                    "movieRatingStddev")


def _genre_idx(s: Optional[str]) -> int:
    return _GENRE_TO_IDX.get(s, -1) if s else -1


def _f(s: Optional[str]) -> float:
    try:
        return float(s) if s not in (None, "") else 0.0
    except ValueError:
        return 0.0


def _i(s: Optional[str]) -> int:
    try:
        return int(float(s)) if s not in (None, "") else 0
    except ValueError:
        return 0


class FeatureAssembler:
    """Assembles the zoo's online feature dict for one user x N candidates.

    store: the `mf:`/`uf:` FeatureStore (see
    `feature_store.export_sample_features`); dm: optional DataManager for
    (a) the movie-side catalog fallback when a movie has no `mf:` hash and
    (b) the nearline real-time history shift (`realtime=True`).
    """

    def __init__(
        self,
        store: FeatureStore,
        dm=None,
        realtime: bool = True,
    ) -> None:
        self.store = store
        self.dm = dm
        self.realtime = realtime
        # Movie-side block cache: every /getrecforyou request re-assembles
        # the SAME top-800 candidate rows (the set is fixed post-load, like
        # the candidate-matrix cache in processes.py) — measured 59% of the
        # per-request cost (tools/rank_load.py microprofile). Keyed on the
        # candidate tuple + store write counter + the candidates' total
        # rating count, so nearline `mf:` writes and catalog add_rating
        # both invalidate.
        self._movie_block_key = None
        self._movie_block_val = None

    # ---- per-entity rows --------------------------------------------------
    def user_row(self, user_id: int) -> Dict[str, float]:
        h = self.store.hgetall(f"{USER_FEATURE_PREFIX}{user_id}") or {}
        row: Dict[str, float] = {}
        for c in USER_INT_COLS:
            row[c] = _i(h.get(c))
        for c in USER_GENRE_COLS:
            row[c] = _genre_idx(h.get(c))
        for c in USER_FLOAT_COLS:
            row[c] = _f(h.get(c))
        if self.realtime and self.dm is not None:
            self._apply_realtime(user_id, row)
        return row

    def _apply_realtime(self, user_id: int, row: Dict[str, float]) -> None:
        """Shift the nearline stream's latest positive behaviour event into
        userRatedMovie1 (most-recent-first history)."""
        user = self.dm.get_user_by_id(user_id)
        feats = getattr(user, "user_features", None) if user else None
        if not feats:
            return
        latest = _i(feats.get("latestMovieId"))
        if latest <= 0 or latest == row[HISTORY_COLUMNS[0]]:
            return
        rating = feats.get("latestMovieRating")
        if rating not in (None, "") and _f(rating) < _POSITIVE_RATING:
            return  # not a positive event: history holds positives only
        for k in range(len(HISTORY_COLUMNS) - 1, 0, -1):
            row[HISTORY_COLUMNS[k]] = row[HISTORY_COLUMNS[k - 1]]
        row[HISTORY_COLUMNS[0]] = latest

    def movie_row(self, movie_id: int) -> Dict[str, float]:
        h = self.store.hgetall(f"{MOVIE_FEATURE_PREFIX}{movie_id}")
        if h:
            row: Dict[str, float] = {
                c: _genre_idx(h.get(c)) for c in MOVIE_GENRE_COLS
            }
            for c in MOVIE_FLOAT_COLS:
                row[c] = _f(h.get(c))
            return row
        # Catalog fallback: the DataManager tracks genres/year/count/avg
        # (Movie.java's fields); stddev is not derivable incrementally.
        row = {c: -1 for c in MOVIE_GENRE_COLS}
        row.update({c: 0.0 for c in MOVIE_FLOAT_COLS})
        m = self.dm.get_movie_by_id(movie_id) if self.dm is not None else None
        if m is not None:
            for k, g in enumerate(m.genres[:3]):
                row[MOVIE_GENRE_COLS[k]] = _genre_idx(g)
            row["releaseYear"] = float(m.release_year)
            row["movieRatingCount"] = float(m.rating_number)
            row["movieAvgRating"] = float(m.average_rating)
        return row

    # ---- batched assembly ---------------------------------------------------
    def features(
        self,
        user_id: int,
        movie_ids: Sequence[int],
        extra_int_cols: Sequence[str] = (),
    ) -> Dict[str, np.ndarray]:
        """Full feature dict for scoring `movie_ids` for `user_id`:
        int32 ids/history, int32 genre vocab indices, float32 numerics —
        the dtypes/encoding `encode_samples` feeds the trainer.
        `extra_int_cols` adds zero-filled int32 columns (e.g. DIEN's
        serve-time negative-history placeholders, which only feed the
        training-time auxiliary heads)."""
        n = len(movie_ids)
        u = self.user_row(int(user_id))
        feats: Dict[str, np.ndarray] = {
            "movieId": np.asarray(movie_ids, np.int32),
            "userId": np.full(n, int(user_id), np.int32),
        }
        for c in USER_INT_COLS + USER_GENRE_COLS:
            feats[c] = np.full(n, int(u[c]), np.int32)
        for c in USER_FLOAT_COLS:
            feats[c] = np.full(n, float(u[c]), np.float32)
        mg, mf = self.movie_block(movie_ids)
        for k, c in enumerate(MOVIE_GENRE_COLS):
            feats[c] = mg[:, k]
        for k, c in enumerate(MOVIE_FLOAT_COLS):
            feats[c] = mf[:, k]
        for c in extra_int_cols:
            feats[c] = np.zeros(n, np.int32)
        return feats

    def movie_block(
        self, movie_ids: Sequence[int]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """([n, 3] int32 genre indices, [n, 4] float32 numerics) for
        movie_ids, cached across requests (see __init__ note)."""
        ids = tuple(int(m) for m in movie_ids)
        stat = 0
        if self.dm is not None:
            for mid in ids:
                m = self.dm.get_movie_by_id(mid)
                if m is not None:
                    stat += m.rating_number
        key = (ids, self.store.mutations, stat)
        if self._movie_block_key == key:
            return self._movie_block_val
        n = len(ids)
        mg = np.full((n, len(MOVIE_GENRE_COLS)), -1, np.int32)
        mf = np.zeros((n, len(MOVIE_FLOAT_COLS)), np.float32)
        for j, mid in enumerate(ids):
            row = self.movie_row(mid)
            for k, c in enumerate(MOVIE_GENRE_COLS):
                mg[j, k] = int(row[c])
            for k, c in enumerate(MOVIE_FLOAT_COLS):
                mf[j, k] = float(row[c])
        mg.setflags(write=False)
        mf.setflags(write=False)
        self._movie_block_key, self._movie_block_val = key, (mg, mf)
        return mg, mf

    def example_features(
        self, n: int = 2, extra_int_cols: Sequence[str] = ()
    ) -> Dict[str, np.ndarray]:
        """Zero-valued full feature dict (correct dtypes/shapes) for
        model.init ahead of checkpoint restore."""
        feats = {
            "movieId": np.zeros(n, np.int32),
            "userId": np.zeros(n, np.int32),
        }
        for c in USER_INT_COLS + USER_GENRE_COLS + MOVIE_GENRE_COLS:
            feats[c] = np.zeros(n, np.int32)
        for c in USER_FLOAT_COLS + MOVIE_FLOAT_COLS:
            feats[c] = np.zeros(n, np.float32)
        for c in extra_int_cols:
            feats[c] = np.zeros(n, np.int32)
        return feats
