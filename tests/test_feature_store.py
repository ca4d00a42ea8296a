"""Feature-store (Redis-role) tests."""

import time

import numpy as np
import pytest

from sparrowrecsys_tpu.config import GENRE_VOCAB
from sparrowrecsys_tpu.serving.feature_store import (
    FeatureStore,
    export_sample_features,
)


def test_hash_round_trip_and_ttl():
    s = FeatureStore()
    s.hset("mf:1", {"a": "1"}, ttl=1000)
    assert s.hgetall("mf:1") == {"a": "1"}
    s.hset("mf:2", {"b": "2"}, ttl=0.01)
    time.sleep(0.05)
    assert s.hgetall("mf:2") is None  # TTL actually enforced


def test_string_keys():
    s = FeatureStore()
    s.set("uEmb:7", "1.0 2.0", ttl=1000)
    assert s.get("uEmb:7") == "1.0 2.0"
    assert s.get("missing") is None


def test_persistence_round_trip(tmp_path):
    s = FeatureStore()
    s.hset("uf:3", {"userAvgRating": "3.50"})
    s.set("i2vEmb:5", "0.1 0.2")
    path = str(tmp_path / "store.json")
    s.save(path)
    loaded = FeatureStore.load(path)
    assert loaded.hgetall("uf:3") == {"userAvgRating": "3.50"}
    assert loaded.get("i2vEmb:5") == "0.1 0.2"


def test_export_latest_row_wins(tiny_catalog, tiny_ratings):
    from sparrowrecsys_tpu.data.feature_pipeline import build_samples

    table = build_samples(tiny_ratings, tiny_catalog)
    store = FeatureStore()
    export_sample_features(table, GENRE_VOCAB, store)
    # user 1's latest sample row should win
    uf = store.hgetall("uf:1")
    assert uf is not None
    latest_i = int(np.argmax(table["timestamp"]))
    assert uf["userRatingCount"] == str(int(table["userRatingCount"][latest_i]))
    mf = store.hgetall("mf:1")
    assert mf is not None and mf["releaseYear"] == "2000"


def test_catalog_attachment(tiny_catalog, tiny_ratings, tmp_path, capsys):
    from sparrowrecsys_tpu.data.feature_pipeline import build_samples
    from sparrowrecsys_tpu.serving.catalog import DataManager, Movie, User

    table = build_samples(tiny_ratings, tiny_catalog)
    store = FeatureStore()
    export_sample_features(table, GENRE_VOCAB, store)
    dm = DataManager()
    dm.movies[1] = Movie(1)
    dm.users[1] = User(1)
    dm.load_feature_store(store)
    assert dm.movies[1].movie_features is not None
    assert dm.users[1].user_features is not None


def test_ttl_survives_persistence(tmp_path):
    """Review regression: expiry epochs travel with the handoff file."""
    s = FeatureStore()
    s.hset("mf:9", {"x": "1"}, ttl=0.05)
    path = str(tmp_path / "store.json")
    s.save(path)
    loaded = FeatureStore.load(path)
    assert loaded.hgetall("mf:9") == {"x": "1"}
    time.sleep(0.1)
    assert loaded.hgetall("mf:9") is None
