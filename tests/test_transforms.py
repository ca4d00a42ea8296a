"""Tests for the feature-encoding demo transforms."""

import numpy as np
import pytest

from sparrowrecsys_tpu.data.transforms import (
    MinMaxScaler,
    QuantileDiscretizer,
    StringIndexer,
    movie_rating_stats,
    multi_hot,
    one_hot,
)


def test_one_hot():
    out = one_hot(np.array([0, 2, 5, -1]), 4)
    assert out.shape == (4, 4)
    assert out[0, 0] == 1 and out[1, 2] == 1
    assert out[2].sum() == 0 and out[3].sum() == 0  # out-of-range -> zeros


def test_string_indexer_frequency_order():
    idx = StringIndexer.fit(["a", "b", "b", "c", "b", "c"])
    assert idx.labels == ["b", "c", "a"]
    np.testing.assert_array_equal(idx.transform(["b", "a", "zz"]), [0, 2, -1])


def test_multi_hot():
    out, indexer = multi_hot([["Action", "Comedy"], ["Action"], []])
    assert out.shape == (3, 2)
    a = indexer.labels.index("Action")
    assert out[0].sum() == 2 and out[1, a] == 1 and out[2].sum() == 0


def test_quantile_discretizer_uniform():
    v = np.arange(1000, dtype=np.float64)
    qd = QuantileDiscretizer.fit(v, num_buckets=10)
    buckets = qd.transform(v)
    assert buckets.min() == 0 and buckets.max() == 9
    # roughly equal bucket sizes
    _, counts = np.unique(buckets, return_counts=True)
    assert counts.min() > 80


def test_minmax_scaler():
    v = np.array([[0.0, 5.0], [10.0, 5.0]])
    sc = MinMaxScaler.fit(v)
    out = sc.transform(v)
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0])
    np.testing.assert_allclose(out[:, 1], [0.5, 0.5])  # constant col -> 0.5


def test_movie_rating_stats():
    stats = movie_rating_stats(
        np.array([1, 1, 2]), np.array([4.0, 2.0, 5.0])
    )
    assert stats["count"].tolist() == [2, 1]
    np.testing.assert_allclose(stats["avgRating"], [3.0, 5.0])
    np.testing.assert_allclose(stats["ratingVar"][0], 2.0)
    assert np.isnan(stats["ratingVar"][1])
