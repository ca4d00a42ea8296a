"""The canonical 27-column training-sample schema.

Matches the header of the reference's bundled
`src/main/resources/webroot/sampledata/testSamples.csv` (line 1), which is the
de-facto schema contract between the Spark feature job
(`FeatureEngForRecModel.scala:299-342`) and the TF model zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

#: Column order of trainingSamples/testSamples CSVs (testSamples.csv:1).
SAMPLE_COLUMNS: List[str] = [
    "movieId", "userId", "rating", "timestamp", "label",
    "releaseYear", "movieGenre1", "movieGenre2", "movieGenre3",
    "movieRatingCount", "movieAvgRating", "movieRatingStddev",
    "userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
    "userRatedMovie4", "userRatedMovie5",
    "userRatingCount", "userAvgReleaseYear", "userReleaseYearStddev",
    "userAvgRating", "userRatingStddev",
    "userGenre1", "userGenre2", "userGenre3", "userGenre4", "userGenre5",
]

GENRE_COLUMNS = [
    "movieGenre1", "movieGenre2", "movieGenre3",
    "userGenre1", "userGenre2", "userGenre3", "userGenre4", "userGenre5",
]

HISTORY_COLUMNS = [
    "userRatedMovie1", "userRatedMovie2", "userRatedMovie3",
    "userRatedMovie4", "userRatedMovie5",
]

#: Numeric feature columns used by the models (`EmbeddingMLP.py:68-74`).
NUMERIC_COLUMNS = [
    "releaseYear", "movieRatingCount", "movieAvgRating", "movieRatingStddev",
    "userRatingCount", "userAvgRating", "userRatingStddev",
]

#: Extra numerics produced by the pipeline but unused by the reference zoo.
EXTRA_NUMERIC_COLUMNS = ["userAvgReleaseYear", "userReleaseYearStddev"]


@dataclasses.dataclass
class SampleTable:
    """Columnar in-memory sample table (the framework's 'DataFrame').

    All columns are dense numpy arrays of one length. Genre columns are
    stored as vocab indices with -1 = missing/OOV (TF's
    `categorical_column_with_vocabulary_list` maps OOV to -1 and
    `embedding_column` emits a zero vector for it). History columns use
    0 = missing, matching `na_value="0"` in `EmbeddingMLP.py:19` plus
    `mask_zero=True` in `DIN.py:137`.
    """

    columns: Dict[str, np.ndarray]

    def __len__(self) -> int:
        return len(next(iter(self.columns.values())))

    def __getitem__(self, key: str) -> np.ndarray:
        return self.columns[key]

    def select(self, idx: np.ndarray) -> "SampleTable":
        return SampleTable({k: v[idx] for k, v in self.columns.items()})

    def to_csv(self, path: str, genre_vocab) -> None:
        """Write in the reference CSV format (strings for genres, '' for
        missing history/genres) so reference tooling can consume our output."""
        import csv

        n = len(self)
        cols = self.columns
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(SAMPLE_COLUMNS)
            for i in range(n):
                row = []
                for c in SAMPLE_COLUMNS:
                    v = cols[c][i]
                    if c in GENRE_COLUMNS:
                        row.append(genre_vocab[int(v)] if int(v) >= 0 else "")
                    elif c in HISTORY_COLUMNS:
                        row.append(str(int(v)) if int(v) > 0 else "")
                    elif c in ("movieAvgRating", "movieRatingStddev",
                               "userAvgRating", "userRatingStddev",
                               "userReleaseYearStddev"):
                        row.append(f"{float(v):.2f}")
                    elif c == "rating":
                        row.append(f"{float(v):g}")
                    else:
                        row.append(str(int(v)))
                w.writerow(row)
