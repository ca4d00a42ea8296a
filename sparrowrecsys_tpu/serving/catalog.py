"""In-memory catalog + feature store — the `DataManager` equivalent.

Rebuild of `online/datamanager/DataManager.java` (312 LoC singleton):
loads movies (title/year/genres + genre reverse index, 55-89/253-258),
links (188-212), ratings (215-250, incremental per-movie averages and
per-user stats), movie/user embeddings (92-126/150-171, `id:f f ...`
files), and serves the query API used by the recommendation pipelines:
`get_movies_by_genre(genre, size, sort_by)` (261-281), `get_movies`
(284-301), `get_movie_by_id` (304), `get_user_by_id` (309).

TPU-native difference: embeddings are ALSO materialized as aligned
device matrices (`movie_emb_matrix` [M, D] in catalog row order,
`user_emb_matrix`) so the rankers run one batched cosine matmul
instead of `Embedding.calculateSimilarity` per candidate
(`Embedding.java:63-80`, the reference's online hot loop).

JSON field shapes (incl. the `{"rating": {...}}` wrapper from
`RatingListSerializer.java:27-40`) live in the entity `to_json` methods.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from sparrowrecsys_tpu.embedding.artifacts import load_embeddings_csv

TOP_RATING_SIZE = 10  # Movie.java:46


@dataclasses.dataclass
class Rating:
    """POJO parity: `Rating.java` (movieId, userId, score, timestamp)."""

    movie_id: int
    user_id: int
    score: float
    timestamp: int

    def to_json(self) -> dict:
        return {
            "movieId": self.movie_id,
            "userId": self.user_id,
            "score": self.score,
            "timestamp": self.timestamp,
        }


def _wrap_ratings(ratings: List[Rating]) -> list:
    """The `{"rating": {...}}` wrapper the frontend depends on
    (`RatingListSerializer.java:27-40`, consumed at `recsys.js:150-151`)."""
    return [{"rating": r.to_json()} for r in ratings]


@dataclasses.dataclass
class Movie:
    movie_id: int
    title: str = ""
    release_year: int = 0
    imdb_id: str = ""
    tmdb_id: str = ""
    genres: List[str] = dataclasses.field(default_factory=list)
    rating_number: int = 0
    average_rating: float = 0.0
    top_ratings: List[Rating] = dataclasses.field(default_factory=list)
    # @JsonIgnore equivalents:
    emb: Optional[np.ndarray] = None
    movie_features: Optional[Dict[str, str]] = None
    # Cached serialized JSON. The catalog is read-only after load_data
    # (the property that makes the thread pool safe, SURVEY.md §5), so
    # each movie's JSON is encoded once and list endpoints join cached
    # strings instead of re-encoding ~32 nested dicts per request —
    # measured 29% of the /getrecforyou core path. add_rating invalidates.
    _json_cache: Optional[str] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def add_rating(self, rating: Rating) -> None:
        """Incremental average (Movie.java:114-120) + bounded sorted top-10
        insert (Movie.java:123-142)."""
        self._json_cache = None
        self.average_rating = (
            self.average_rating * self.rating_number + rating.score
        ) / (self.rating_number + 1)
        self.rating_number += 1
        # top_ratings kept sorted descending by score.
        lo, hi = 0, len(self.top_ratings)
        while lo < hi:
            mid = (lo + hi) // 2
            if self.top_ratings[mid].score >= rating.score:
                lo = mid + 1
            else:
                hi = mid
        self.top_ratings.insert(lo, rating)
        if len(self.top_ratings) > TOP_RATING_SIZE:
            self.top_ratings.pop()

    def to_json(self) -> dict:
        return {
            "movieId": self.movie_id,
            "title": self.title,
            "releaseYear": self.release_year,
            "imdbId": self.imdb_id,
            "tmdbId": self.tmdb_id,
            "genres": self.genres,
            "ratingNumber": self.rating_number,
            "averageRating": self.average_rating,
            "topRatings": _wrap_ratings(self.top_ratings),
        }

    def to_json_str(self) -> str:
        """Serialized `to_json()`, cached until the next add_rating.
        Byte-identical to json.dumps(self.to_json())."""
        if self._json_cache is None:
            import json

            self._json_cache = json.dumps(self.to_json())
        return self._json_cache


@dataclasses.dataclass
class User:
    user_id: int
    ratings: List[Rating] = dataclasses.field(default_factory=list)
    average_rating: float = 0.0
    highest_rating: float = 0.0
    lowest_rating: float = 5.0
    rating_count: int = 0
    emb: Optional[np.ndarray] = None
    user_features: Optional[Dict[str, str]] = None

    def add_rating(self, rating: Rating) -> None:
        """User.java:88-107: append + running average/extremes."""
        self.ratings.append(rating)
        self.average_rating = (
            self.average_rating * self.rating_count + rating.score
        ) / (self.rating_count + 1)
        self.highest_rating = max(self.highest_rating, rating.score)
        self.lowest_rating = min(self.lowest_rating, rating.score)
        self.rating_count += 1

    def to_json(self) -> dict:
        return {
            "userId": self.user_id,
            "ratings": _wrap_ratings(self.ratings),
            "averageRating": self.average_rating,
            "highestRating": self.highest_rating,
            "lowestRating": self.lowest_rating,
            "ratingCount": self.rating_count,
        }


class DataManager:
    """Loads everything once; read-only afterwards (thread-safe for the
    HTTP server's worker threads, same property the reference relies on —
    SURVEY.md §5 race-detection note)."""

    def __init__(self) -> None:
        self.movies: Dict[int, Movie] = {}
        self.users: Dict[int, User] = {}
        self.links: Dict[int, tuple] = {}
        self.genre_index: Dict[str, List[Movie]] = {}
        # Device-side aligned embedding matrices.
        self.movie_emb_ids: np.ndarray = np.empty(0, np.int64)
        self.movie_emb_matrix: np.ndarray = np.zeros((0, 0), np.float32)
        self.user_emb_ids: np.ndarray = np.empty(0, np.int64)
        self.user_emb_matrix: np.ndarray = np.zeros((0, 0), np.float32)
        self._movie_emb_row: Dict[int, int] = {}
        self._user_emb_row: Dict[int, int] = {}

    # ---- loading (DataManager.loadData, RecSysServer.java:50-54) --------
    def load_data(
        self,
        movies_csv: str,
        links_csv: Optional[str],
        ratings_csv: Optional[str],
        movie_emb_csv: Optional[str],
        user_emb_csv: Optional[str],
    ) -> "DataManager":
        self._load_movies(movies_csv)
        if links_csv:
            self._load_links(links_csv)
        if ratings_csv:
            self._load_ratings(ratings_csv)
        if movie_emb_csv:
            self._load_movie_emb(movie_emb_csv)
        if user_emb_csv:
            self._load_user_emb(user_emb_csv)
        return self

    def _load_movies(self, path: str) -> None:
        # One parser for both planes: the offline loader owns CSV/title
        # semantics (data.movielens.load_movies).
        from sparrowrecsys_tpu.data.movielens import load_movies

        catalog = load_movies(path)
        for i in range(len(catalog)):
            mid = int(catalog.movie_ids[i])
            genres = [g for g in catalog.genres[i] if g]
            m = Movie(
                mid, catalog.titles[i], int(catalog.release_years[i]),
                genres=genres,
            )
            self.movies[mid] = m
            for g in genres:
                self.genre_index.setdefault(g, []).append(m)
        print(f"Loading movie data completed. {len(self.movies)} movies in total.")

    def _load_links(self, path: str) -> None:
        from sparrowrecsys_tpu.data.movielens import load_links

        for mid, (imdb, tmdb) in load_links(path).items():
            m = self.movies.get(mid)
            if m is not None:
                m.imdb_id, m.tmdb_id = imdb, tmdb

    def _load_ratings(self, path: str) -> None:
        # Native C++ parse when available (memory-bandwidth at 20M rows),
        # Python fallback — one code path for row semantics either way.
        from sparrowrecsys_tpu.native import load_ratings_native

        ratings = load_ratings_native(path)
        for i in range(len(ratings)):
            uid, mid = int(ratings.user_ids[i]), int(ratings.movie_ids[i])
            r = Rating(mid, uid, float(ratings.ratings[i]), int(ratings.timestamps[i]))
            movie = self.movies.get(mid)
            if movie is not None:
                movie.add_rating(r)
            if uid not in self.users:
                self.users[uid] = User(uid)
            self.users[uid].add_rating(r)
        print(f"Loading rating data completed. {len(ratings)} ratings in total.")

    def _load_movie_emb(self, path: str) -> None:
        embs = load_embeddings_csv(path)
        ids, rows = [], []
        for mid, vec in embs.items():
            m = self.movies.get(mid)
            if m is not None:
                m.emb = vec
            ids.append(mid)
            rows.append(vec)
        self.movie_emb_ids = np.asarray(ids, np.int64)
        self.movie_emb_matrix = (
            np.stack(rows).astype(np.float32) if rows else np.zeros((0, 0), np.float32)
        )
        self._movie_emb_row = {int(i): r for r, i in enumerate(ids)}
        print(f"Loading movie embedding completed. {len(ids)} movie embeddings.")

    def _load_user_emb(self, path: str) -> None:
        embs = load_embeddings_csv(path)
        ids, rows = [], []
        for uid, vec in embs.items():
            u = self.users.get(uid)
            if u is not None:
                u.emb = vec
            ids.append(uid)
            rows.append(vec)
        self.user_emb_ids = np.asarray(ids, np.int64)
        self.user_emb_matrix = (
            np.stack(rows).astype(np.float32) if rows else np.zeros((0, 0), np.float32)
        )
        self._user_emb_row = {int(i): r for r, i in enumerate(ids)}
        print(f"Loading user embedding completed. {len(ids)} user embeddings.")

    # ---- query API -------------------------------------------------------
    def get_movies_by_genre(
        self, genre: str, size: int, sort_by: str = "rating"
    ) -> List[Movie]:
        """DataManager.java:261-281. The reference NPEs on an unknown genre
        (DataManager.java:263) — here it raises KeyError, which the service
        layer's catch-all turns into the same empty response."""
        movies = list(self.genre_index[genre])
        self._sort(movies, sort_by)
        return movies[:size]

    def get_movies(self, size: int, sort_by: str = "rating") -> List[Movie]:
        movies = list(self.movies.values())
        self._sort(movies, sort_by)
        return movies[:size]

    @staticmethod
    def _sort(movies: List[Movie], sort_by: str) -> None:
        if sort_by == "rating":
            movies.sort(key=lambda m: m.average_rating, reverse=True)
        elif sort_by == "releaseYear":
            movies.sort(key=lambda m: m.release_year, reverse=True)

    def get_movie_by_id(self, movie_id: int) -> Optional[Movie]:
        return self.movies.get(movie_id)

    def get_user_by_id(self, user_id: int) -> Optional[User]:
        return self.users.get(user_id)

    def load_feature_store(
        self, store, load_movie: bool = True, load_user: bool = True
    ) -> None:
        """Attach `mf:`/`uf:` hashes to entities — the role of
        `DataManager.loadMovieFeatures` (DataManager.java:129-147, gated by
        `Config.IS_LOAD_ITEM_FEATURE_FROM_REDIS`) and the per-request
        `uf:<id>` fetch in `RecForYouProcess.java:49-56`."""
        from sparrowrecsys_tpu.serving.feature_store import (
            MOVIE_FEATURE_PREFIX,
            USER_FEATURE_PREFIX,
        )

        if isinstance(store, str):
            from sparrowrecsys_tpu.serving.feature_store import FeatureStore

            store = FeatureStore.load(store)
        if load_movie:
            n = 0
            for mid, movie in self.movies.items():
                feats = store.hgetall(f"{MOVIE_FEATURE_PREFIX}{mid}")
                if feats is not None:
                    movie.movie_features = feats
                    n += 1
            print(f"Loading movie features completed. {n} movie features.")
        if load_user:
            n = 0
            for uid, user in self.users.items():
                feats = store.hgetall(f"{USER_FEATURE_PREFIX}{uid}")
                if feats is not None:
                    user.user_features = feats
                    n += 1
            print(f"Loading user features completed. {n} user features.")

    # ---- embedding access for the rankers -------------------------------
    def movie_emb_row(self, movie_id: int) -> int:
        return self._movie_emb_row.get(movie_id, -1)

    def user_emb_row(self, user_id: int) -> int:
        return self._user_emb_row.get(user_id, -1)
