"""Feature-plane tests: hand-computed golden values on a tiny fixture plus
schema/semantics checks against the reference's bundled testSamples.csv."""

import numpy as np
import pytest

from sparrowrecsys_tpu.config import GENRE_VOCAB
from sparrowrecsys_tpu.data.feature_pipeline import build_samples, split_samples
from sparrowrecsys_tpu.data.dataset import load_samples_csv, encode_samples
from sparrowrecsys_tpu.data.movielens import (
    load_movies,
    parse_release_year,
    ratings_from_samples_csv,
)

ACTION = GENRE_VOCAB.index("Action")
COMEDY = GENRE_VOCAB.index("Comedy")
DRAMA = GENRE_VOCAB.index("Drama")


def test_parse_release_year():
    assert parse_release_year("Toy Story (1995)") == ("Toy Story", 1995)
    assert parse_release_year("C") == ("C", 1990)
    assert parse_release_year("Weird (title) (2003)") == ("Weird (title)", 2003)


def test_build_samples_golden(tiny_catalog, tiny_ratings):
    table = build_samples(tiny_ratings, tiny_catalog)
    # Rows 0 (empty window) and 1 (count==1) are filtered: userRatingCount>1.
    assert len(table) == 2
    # Remaining rows are the t=3 (movie 3) and t=4 (movie 1) events.
    assert list(table["movieId"]) == [3, 1]
    assert list(table["label"]) == [1, 1]

    # --- movie features (global stats) ---
    # movie 3: one rating of 5.0 -> count 1, avg 5.0, stddev NaN->0.
    assert table["movieRatingCount"][0] == 1
    assert table["movieAvgRating"][0] == pytest.approx(5.0)
    assert table["movieRatingStddev"][0] == pytest.approx(0.0)
    # movie 1: ratings 4.0, 4.0 -> count 2, avg 4.0, stddev 0.
    assert table["movieRatingCount"][1] == 2
    assert table["movieAvgRating"][1] == pytest.approx(4.0)
    assert table["releaseYear"][0] == 1990 and table["releaseYear"][1] == 2000
    assert table["movieGenre1"][1] == ACTION and table["movieGenre2"][1] == COMEDY
    assert table["movieGenre1"][0] == DRAMA and table["movieGenre2"][0] == -1

    # --- user windowed features, row t=3 (window = rows t=1,t=2) ---
    assert table["userRatingCount"][0] == 2
    assert table["userAvgRating"][0] == pytest.approx(3.5)   # (4+3)/2
    assert table["userRatingStddev"][0] == pytest.approx(0.71)  # std([4,3]) 2dp
    assert table["userAvgReleaseYear"][0] == 2005
    assert table["userReleaseYearStddev"][0] == pytest.approx(7.07)
    # positive history before t=3: only t=1 (movie 1, rating 4 >= 3.5).
    assert table["userRatedMovie1"][0] == 1
    assert table["userRatedMovie2"][0] == 0
    # genres of positive history = Action, Comedy (tie -> vocab order).
    assert table["userGenre1"][0] == ACTION
    assert table["userGenre2"][0] == COMEDY
    assert table["userGenre3"][0] == -1

    # --- row t=4 (window = t=1..3) ---
    assert table["userRatingCount"][1] == 3
    assert table["userAvgRating"][1] == pytest.approx(4.0)   # (4+3+5)/3
    assert table["userRatingStddev"][1] == pytest.approx(1.0)
    # positives before t=4: t=3 (movie 3) then t=1 (movie 1), recent first.
    assert table["userRatedMovie1"][1] == 3
    assert table["userRatedMovie2"][1] == 1
    assert table["userRatedMovie3"][1] == 0
    # genre counts: Action 1, Comedy 1, Drama 1 -> vocab order.
    assert table["userGenre1"][1] == ACTION
    assert table["userGenre2"][1] == COMEDY
    assert table["userGenre3"][1] == DRAMA


def test_window_cutoff(tiny_catalog, tiny_ratings):
    # window=2: at t=4 only rows t=2,t=3 are visible.
    table = build_samples(tiny_ratings, tiny_catalog, window=2)
    row = np.flatnonzero(table["timestamp"] == 4)[0]
    assert table["userRatingCount"][row] == 2
    assert table["userAvgRating"][row] == pytest.approx(4.0)  # (3+5)/2
    # positive within window: only t=3 (movie 3); t=1 fell out.
    assert table["userRatedMovie1"][row] == 3
    assert table["userRatedMovie2"][row] == 0


def test_label_threshold(tiny_catalog):
    from sparrowrecsys_tpu.data.movielens import Ratings

    r = Ratings(
        user_ids=np.array([1, 1, 1], dtype=np.int32),
        movie_ids=np.array([1, 2, 3], dtype=np.int32),
        ratings=np.array([3.5, 3.49, 5.0], dtype=np.float32),
        timestamps=np.array([1, 2, 3], dtype=np.int64),
    )
    t = build_samples(r, tiny_catalog, min_user_rating_count=0)
    assert list(t["label"]) == [1, 0, 1]


def test_reference_testsamples_roundtrip(reference_test_samples_path):
    table = load_samples_csv(reference_test_samples_path)
    assert len(table) == 22440
    # Schema contract: label == (rating >= 3.5) on every reference row.
    np.testing.assert_array_equal(
        table["label"], (table["rating"] >= 3.5).astype(np.int32)
    )
    # Id spaces fit the model vocab sizes (EmbeddingMLP.py:57-64).
    assert table["movieId"].max() <= 1000
    assert table["userId"].max() <= 30000
    # Genres decode into the 19-genre vocabulary or missing.
    for c in ("movieGenre1", "userGenre1"):
        assert table[c].min() >= -1 and table[c].max() < len(GENRE_VOCAB)
    ds = encode_samples(table)
    assert len(ds) == 22440
    assert ds.features["movieAvgRating"].dtype == np.float32


def test_ratings_recovery(reference_test_samples_path):
    r = ratings_from_samples_csv(reference_test_samples_path)
    assert len(r) > 20000
    assert r.ratings.min() >= 0.5 and r.ratings.max() <= 5.0


def test_pipeline_on_reference_ratings(reference_test_samples_path, reference_movies_path):
    """End-to-end: recovered ratings + real catalog -> 27-column samples."""
    ratings = ratings_from_samples_csv(reference_test_samples_path)
    catalog = load_movies(reference_movies_path)
    table = build_samples(ratings, catalog)
    assert len(table) > 1000
    # history is positive-only: every non-missing history id rated >= 3.5 earlier
    assert (table["userRatedMovie1"] >= 0).all()
    # split determinism
    tr1, te1 = split_samples(table, seed=7)
    tr2, te2 = split_samples(table, seed=7)
    assert len(tr1) == len(tr2) and len(te1) == len(te2)
    assert len(tr1) + len(te1) == len(table)


def test_split_by_time(tiny_catalog, tiny_ratings):
    table = build_samples(tiny_ratings, tiny_catalog, min_user_rating_count=0)
    tr, te = split_samples(table, by_time=True, train_fraction=0.5)
    assert tr["timestamp"].max() <= te["timestamp"].min()


def test_batching(tiny_catalog, tiny_ratings):
    table = build_samples(tiny_ratings, tiny_catalog, min_user_rating_count=0)
    ds = encode_samples(table)
    batches = list(ds.batches(3, pad_final=True))
    assert len(batches) == 2
    f, l, mask = batches[1]
    assert len(l) == 3 and mask is not None and mask.sum() == 1.0


def test_extended_history_length(tiny_catalog):
    """history_length > 5 emits correct extra columns (long-history DIN)."""
    from sparrowrecsys_tpu.data.movielens import Ratings

    n = 12
    ratings = Ratings(
        user_ids=np.ones(n, np.int32),
        movie_ids=np.array([1, 2, 3] * 4, np.int32),
        ratings=np.full(n, 5.0, np.float32),  # all positive
        timestamps=np.arange(1, n + 1, dtype=np.int64),
    )
    table = build_samples(ratings, tiny_catalog, history_length=8)
    assert "userRatedMovie8" in table.columns
    # Last row: history = previous positives most-recent-first.
    last = len(table) - 1
    # Last kept row is the t=12 event (movie 3); its history is the
    # preceding positives most-recent-first: t=11 (movie 2), t=10 (1), ...
    expect = [2, 1, 3, 2, 1, 3, 2, 1]
    got = [int(table[f"userRatedMovie{k+1}"][last]) for k in range(8)]
    assert got == expect, got
    # Encoded dataset carries the extended columns through.
    from sparrowrecsys_tpu.data.dataset import encode_samples

    ds = encode_samples(table)
    assert "userRatedMovie8" in ds.features


def test_din_with_extended_history(tiny_catalog):
    import jax
    import jax.numpy as jnp

    from sparrowrecsys_tpu.models import build_model

    model = build_model("din", recent_movies=8)
    rng = np.random.default_rng(0)
    feats = {
        "movieId": rng.integers(1, 100, 4).astype(np.int32),
        "userId": rng.integers(1, 100, 4).astype(np.int32),
        "userGenre1": rng.integers(-1, 19, 4).astype(np.int32),
        "movieGenre1": rng.integers(-1, 19, 4).astype(np.int32),
    }
    for k in range(8):
        feats[f"userRatedMovie{k+1}"] = rng.integers(0, 100, 4).astype(np.int32)
    for c in ("userRatingCount", "userAvgRating", "userRatingStddev",
              "releaseYear", "movieRatingCount", "movieAvgRating",
              "movieRatingStddev"):
        feats[c] = rng.normal(size=4).astype(np.float32)
    feats = {k: jnp.asarray(v) for k, v in feats.items()}
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    out = model.apply({"params": params}, feats)
    assert out.shape == (4,)
