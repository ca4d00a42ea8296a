"""MovieLens CSV loaders.

Replaces the loaders scattered across the reference:
- movies.csv parsing incl. `title (YYYY)` release-year extraction
  (`online/datamanager/DataManager.java:55-89,174-185`,
   `FeatureEngForRecModel.scala:52-59`),
- links.csv (`DataManager.java:188-212`),
- ratings.csv (`DataManager.java:215-250`).

The reference snapshot is missing `ratings.csv` (stripped large blob); the
bundled `testSamples.csv` carries 22k genuine (userId, movieId, rating,
timestamp) tuples in its first four columns, which
`ratings_from_samples_csv` recovers as the rating source.
"""

from __future__ import annotations

import csv
import dataclasses
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

_YEAR_RE = re.compile(r"\((\d{4})\)\s*$")

#: Default year when the title has no parseable suffix
#: (`FeatureEngForRecModel.scala:52-59` defaults to 1990).
DEFAULT_RELEASE_YEAR = 1990


@dataclasses.dataclass
class MovieCatalog:
    """Columnar movie table + genre reverse index.

    Mirrors the data held by `DataManager.loadMovieData`
    (`DataManager.java:55-89`): id, cleaned title, release year, genres,
    and a genre -> movie reverse index (`DataManager.java:253-258`).
    """

    movie_ids: np.ndarray              # int32 [M]
    titles: List[str]                  # cleaned, year suffix removed
    release_years: np.ndarray          # int32 [M]
    genres: List[List[str]]            # raw genre strings, '|'-split order kept
    id_to_row: Dict[int, int]
    genre_index: Dict[str, List[int]]  # genre -> list of movieIds

    def __len__(self) -> int:
        return len(self.movie_ids)

    def row(self, movie_id: int) -> Optional[int]:
        return self.id_to_row.get(int(movie_id))


def parse_release_year(title: str) -> Tuple[str, int]:
    """Split 'Toy Story (1995)' -> ('Toy Story', 1995).

    Reference behaviour (`FeatureEngForRecModel.scala:52-64`): titles shorter
    than 6 chars or without a year suffix default to DEFAULT_RELEASE_YEAR and
    the title is returned trimmed.
    """
    title = title.strip()
    m = _YEAR_RE.search(title)
    if m is None or len(title) < 6:
        return title, DEFAULT_RELEASE_YEAR
    return title[: m.start()].strip(), int(m.group(1))


def _read_csv(path: str) -> List[List[str]]:
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        rows = list(reader)
    return rows[1:]  # drop header


def load_movies(path: str) -> MovieCatalog:
    rows = _read_csv(path)
    movie_ids = np.empty(len(rows), dtype=np.int32)
    titles: List[str] = []
    years = np.empty(len(rows), dtype=np.int32)
    genres: List[List[str]] = []
    id_to_row: Dict[int, int] = {}
    genre_index: Dict[str, List[int]] = {}
    for i, row in enumerate(rows):
        mid = int(row[0])
        title, year = parse_release_year(row[1])
        gs = row[2].split("|") if len(row) > 2 and row[2] else []
        movie_ids[i] = mid
        titles.append(title)
        years[i] = year
        genres.append(gs)
        id_to_row[mid] = i
        for g in gs:
            genre_index.setdefault(g, []).append(mid)
    return MovieCatalog(movie_ids, titles, years, genres, id_to_row, genre_index)


def load_links(path: str) -> Dict[int, Tuple[str, str]]:
    """movieId -> (imdbId, tmdbId), parity with `DataManager.java:188-212`."""
    out: Dict[int, Tuple[str, str]] = {}
    for row in _read_csv(path):
        if len(row) >= 3:
            out[int(row[0])] = (row[1], row[2])
    return out


@dataclasses.dataclass
class Ratings:
    """Columnar rating events: userId, movieId, rating, timestamp."""

    user_ids: np.ndarray   # int32 [N]
    movie_ids: np.ndarray  # int32 [N]
    ratings: np.ndarray    # float32 [N]
    timestamps: np.ndarray # int64 [N]

    def __len__(self) -> int:
        return len(self.user_ids)


def load_ratings(path: str) -> Ratings:
    """Load a `userId,movieId,rating,timestamp` CSV (`DataManager.java:226-233`)."""
    rows = _read_csv(path)
    n = len(rows)
    u = np.empty(n, dtype=np.int32)
    m = np.empty(n, dtype=np.int32)
    r = np.empty(n, dtype=np.float32)
    t = np.empty(n, dtype=np.int64)
    for i, row in enumerate(rows):
        u[i] = int(row[0]); m[i] = int(row[1])
        r[i] = float(row[2]); t[i] = int(row[3])
    return Ratings(u, m, r, t)


def ratings_from_samples_csv(path: str) -> Ratings:
    """Recover rating tuples from a trainingSamples/testSamples-format CSV.

    The first four columns of the 27-column sample schema are genuine
    (movieId, userId, rating, timestamp) events (testSamples.csv:1). Used to
    regenerate a ratings source when ratings.csv is unavailable.
    """
    rows = _read_csv(path)
    n = len(rows)
    u = np.empty(n, dtype=np.int32)
    m = np.empty(n, dtype=np.int32)
    r = np.empty(n, dtype=np.float32)
    t = np.empty(n, dtype=np.int64)
    for i, row in enumerate(rows):
        m[i] = int(row[0]); u[i] = int(row[1])
        r[i] = float(row[2]); t[i] = int(row[3])
    # De-duplicate (user, movie, ts) triples, keep stable order.
    key = np.stack([u.astype(np.int64), m.astype(np.int64), t], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    keep = np.sort(first)
    return Ratings(u[keep], m[keep], r[keep], t[keep])


def write_ratings_csv(ratings: Ratings, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:  # C-accelerated writer when available (20M-row scale)
        import pandas as pd

        pd.DataFrame(
            {
                "userId": ratings.user_ids,
                "movieId": ratings.movie_ids,
                "rating": ratings.ratings.astype(np.float64),
                "timestamp": ratings.timestamps,
            }
        ).to_csv(path, index=False)
        return
    except ImportError:
        pass
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["userId", "movieId", "rating", "timestamp"])
        for i in range(len(ratings)):
            w.writerow([
                int(ratings.user_ids[i]), int(ratings.movie_ids[i]),
                f"{float(ratings.ratings[i]):g}", int(ratings.timestamps[i]),
            ])
