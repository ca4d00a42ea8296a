"""Full-feature online scoring: assembler consistency + serving wiring.

The key guarantee is ONLINE/OFFLINE FEATURE CONSISTENCY — the classic
industrial-recsys failure mode: the features a model sees at serve time
must be encoded exactly as the training pipeline encoded them. The
assembler reads the `mf:`/`uf:` store written by
`export_sample_features` (the reference's Redis export,
`FeatureEngForRecModel.scala:144-192, 239-296`), so for each entity's
LATEST sample row the assembled values must reproduce the encoded
training columns (the export's 2-dp string rounding is part of the
contract and applied to both sides here, exactly as the reference's
Redis round-trip rounds what its TF-Serving request would carry).
"""

from __future__ import annotations

import numpy as np
import pytest

from sparrowrecsys_tpu.config import GENRE_VOCAB
from sparrowrecsys_tpu.data import (
    build_samples,
    load_movies,
    ratings_from_samples_csv,
)
from sparrowrecsys_tpu.data.dataset import encode_samples
from sparrowrecsys_tpu.serving.assembler import (
    FeatureAssembler,
    MOVIE_FLOAT_COLS,
    MOVIE_GENRE_COLS,
    USER_FLOAT_COLS,
    USER_GENRE_COLS,
    USER_INT_COLS,
)
from sparrowrecsys_tpu.serving.feature_store import (
    FeatureStore,
    export_sample_features,
)

DATA = "data"


@pytest.fixture(scope="module")
def sample_world():
    ratings = ratings_from_samples_csv(f"{DATA}/goldenTestSamples.csv")
    catalog = load_movies(f"{DATA}/movies.csv")
    table = build_samples(ratings, catalog)
    store = FeatureStore()
    export_sample_features(table, GENRE_VOCAB, store)
    ds = encode_samples(table)
    return table, store, ds


def _latest_row(table, col, key):
    idx = np.flatnonzero(np.asarray(table[col]) == key)
    return idx[np.argmax(np.asarray(table["timestamp"])[idx])]


def test_user_side_matches_offline_encoding(sample_world):
    table, store, ds = sample_world
    asm = FeatureAssembler(store)
    uids = np.asarray(table["userId"])
    rng = np.random.default_rng(0)
    for uid in rng.choice(np.unique(uids), 20, replace=False):
        i = _latest_row(table, "userId", uid)
        row = asm.user_row(int(uid))
        for c in USER_INT_COLS + USER_GENRE_COLS:
            assert row[c] == int(ds.features[c][i]), (uid, c)
        for c in USER_FLOAT_COLS:
            # The store carries the reference's 2-dp Redis strings for the
            # stddev/avg columns; counts/years are integral. Compare at
            # the export's precision.
            assert abs(row[c] - float(ds.features[c][i])) < 5e-3 + 1e-6, (uid, c)


def test_movie_side_matches_offline_encoding(sample_world):
    table, store, ds = sample_world
    asm = FeatureAssembler(store)
    mids = np.asarray(table["movieId"])
    rng = np.random.default_rng(1)
    for mid in rng.choice(np.unique(mids), 20, replace=False):
        i = _latest_row(table, "movieId", mid)
        row = asm.movie_row(int(mid))
        for c in MOVIE_GENRE_COLS:
            assert row[c] == int(ds.features[c][i]), (mid, c)
        for c in MOVIE_FLOAT_COLS:
            assert abs(row[c] - float(ds.features[c][i])) < 5e-3 + 1e-6, (mid, c)


def test_catalog_fallback_for_unexported_movie(sample_world):
    _, store, _ = sample_world
    from sparrowrecsys_tpu.serving.catalog import DataManager

    dm = DataManager().load_data(f"{DATA}/movies.csv", None, None, None, None)
    asm = FeatureAssembler(FeatureStore(), dm)  # empty store: catalog only
    m = next(iter(dm.movies.values()))
    row = asm.movie_row(m.movie_id)
    assert row["releaseYear"] == float(m.release_year)
    if m.genres:
        assert row["movieGenre1"] == GENRE_VOCAB.index(m.genres[0]) if m.genres[0] in GENRE_VOCAB else row["movieGenre1"] == -1


def test_realtime_history_shift(sample_world):
    table, store, _ = sample_world
    from sparrowrecsys_tpu.serving.catalog import DataManager, User

    dm = DataManager().load_data(f"{DATA}/movies.csv", None, None, None, None)
    uid = int(np.asarray(table["userId"])[0])
    user = User(uid)
    dm.users[uid] = user
    asm = FeatureAssembler(store, dm)
    base = asm.user_row(uid)

    # Positive nearline event shifts into userRatedMovie1.
    user.user_features = {"latestMovieId": "777", "latestMovieRating": "4.5"}
    shifted = asm.user_row(uid)
    assert shifted["userRatedMovie1"] == 777
    assert shifted["userRatedMovie2"] == base["userRatedMovie1"]

    # Negative event must NOT enter the positives-only history.
    user.user_features = {"latestMovieId": "778", "latestMovieRating": "2.0"}
    assert asm.user_row(uid)["userRatedMovie1"] == base["userRatedMovie1"]

    # Duplicate of the current head: no shift.
    head = str(base["userRatedMovie1"])
    user.user_features = {"latestMovieId": head, "latestMovieRating": "5.0"}
    assert asm.user_row(uid)["userRatedMovie2"] == base["userRatedMovie2"]


def test_full_feature_scorer_and_process_routing(sample_world):
    table, store, _ = sample_world
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.serving.catalog import DataManager
    from sparrowrecsys_tpu.serving.processes import RecForYouProcess
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    dm = DataManager().load_data(
        f"{DATA}/movies.csv", None, f"{DATA}/ratings.csv", None, None
    )
    asm = FeatureAssembler(store, dm)
    model = build_model("deepfm")
    params = model.init(
        jax.random.PRNGKey(0), asm.example_features(2)
    )["params"]
    scorer = ModelScorer(model, params, batch_pad=64, assembler=asm)

    uid = int(np.asarray(table["userId"])[0])
    mids = [int(m) for m in np.unique(np.asarray(table["movieId"]))[:10]]
    s1 = scorer.score(uid, mids)
    s2 = scorer.score(uid, mids)
    assert s1.shape == (10,)
    assert np.all((s1 >= 0) & (s1 <= 1))
    np.testing.assert_array_equal(s1, s2)  # deterministic

    proc = RecForYouProcess(dm, scorers={"deepfm": scorer})
    out = proc.get_rec_list(uid, 5, "deepfm")
    assert len(out) == 5
    # Routing really used the scorer: order equals score-descending order.
    cands, _ = proc._candidate_set()
    scores = scorer.score(uid, [c.movie_id for c in cands])
    expect = [cands[i].movie_id for i in np.argsort(-scores, kind="stable")][:5]
    assert [m.movie_id for m in out] == expect


def test_dien_serves_with_zero_negative_columns(sample_world):
    table, store, _ = sample_world
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.models.dien import NEGATIVE_COLS
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    asm = FeatureAssembler(store)
    model = build_model("dien")
    params = model.init(
        jax.random.PRNGKey(0), asm.example_features(2, NEGATIVE_COLS)
    )["params"]
    scorer = ModelScorer(
        model, params, batch_pad=16, assembler=asm,
        extra_int_cols=NEGATIVE_COLS,
    )
    uid = int(np.asarray(table["userId"])[0])
    s = scorer.score(uid, [1, 2, 3])
    assert s.shape == (3,) and np.all(np.isfinite(s))


def test_movie_block_cache_and_invalidation(sample_world):
    """The movie-side block is cached across requests (59% of measured
    request cost — tools/rank_load.py) and invalidated by BOTH write
    surfaces: a store `mf:` hset and a catalog add_rating."""
    table, store, ds = sample_world
    from sparrowrecsys_tpu.serving.catalog import DataManager, Rating

    dm = DataManager().load_data(
        f"{DATA}/movies.csv", None, f"{DATA}/ratings.csv", None, None
    )
    asm = FeatureAssembler(store, dm)
    mids = [int(m) for m in np.unique(np.asarray(table["movieId"]))[:8]]

    a1 = asm.features(1, mids)
    mg1, mf1 = asm.movie_block(mids)
    mg2, mf2 = asm.movie_block(mids)
    assert mg1 is mg2 and mf1 is mf2  # cache hit: same arrays

    # store write -> rebuilt block reflects the new mf: hash
    store.hset(f"mf:{mids[0]}", {"movieAvgRating": "9.99",
                                 "movieGenre1": "Action"})
    mg3, mf3 = asm.movie_block(mids)
    assert mg3 is not mg1
    assert mf3[0, 2] == np.float32(9.99)

    # catalog add_rating on a candidate -> invalidated again
    before = asm.movie_block(mids)
    m = dm.get_movie_by_id(mids[1])
    if m is not None:
        m.add_rating(Rating(movie_id=mids[1], user_id=1, score=5.0,
                            timestamp=1))
        after = asm.movie_block(mids)
        assert after[0] is not before[0]

    # assembled features equal a fresh assembler's (cache is transparent)
    fresh = FeatureAssembler(store, dm).features(1, mids)
    again = asm.features(1, mids)
    for k in fresh:
        np.testing.assert_array_equal(fresh[k], again[k])
    assert set(a1) == set(fresh)


def test_score_many_matches_per_user_score(sample_world):
    table, store, _ = sample_world
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    asm = FeatureAssembler(store)
    model = build_model("deepfm")
    params = model.init(jax.random.PRNGKey(0), asm.example_features(2))["params"]
    scorer = ModelScorer(model, params, batch_pad=64, assembler=asm)

    uids = [int(u) for u in np.unique(np.asarray(table["userId"]))[:3]]
    mids = [int(m) for m in np.unique(np.asarray(table["movieId"]))[:10]]
    many = scorer.score_many(uids, mids)
    assert many.shape == (3, 10)
    for i, uid in enumerate(uids):
        np.testing.assert_allclose(
            many[i], scorer.score(uid, mids), rtol=1e-5, atol=1e-6
        )


def test_ranker_micro_batched_model_path_matches_direct(sample_world):
    table, store, _ = sample_world
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.serving.catalog import DataManager
    from sparrowrecsys_tpu.serving.processes import RecForYouProcess
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    dm = DataManager().load_data(
        f"{DATA}/movies.csv", None, f"{DATA}/ratings.csv",
        f"{DATA}/modeldata/item2vecEmb.csv", f"{DATA}/modeldata/userEmb.csv",
    )
    asm = FeatureAssembler(store, dm)
    model = build_model("deepfm")
    params = model.init(jax.random.PRNGKey(0), asm.example_features(2))["params"]
    scorer = ModelScorer(model, params, batch_pad=64, assembler=asm)

    direct = RecForYouProcess(dm, scorers={"deepfm": scorer})
    batched = RecForYouProcess(
        dm, scorers={"deepfm": scorer}, micro_batch=True, batch_wait_ms=0.0
    )
    uid = int(np.asarray(table["userId"])[0])
    a = [m.movie_id for m in direct.get_rec_list(uid, 8, "deepfm")]
    b = [m.movie_id for m in batched.get_rec_list(uid, 8, "deepfm")]
    assert a == b
    # the batched path really went through the model batcher
    assert batched._model_batchers["deepfm"].n_waves >= 1


def test_score_wave_matches_score_many_and_invalidates(sample_world):
    table, store, _ = sample_world
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    asm = FeatureAssembler(store)
    model = build_model("deepfm")
    params = model.init(jax.random.PRNGKey(0), asm.example_features(2))["params"]
    scorer = ModelScorer(model, params, batch_pad=64, assembler=asm)

    uids = [int(u) for u in np.unique(np.asarray(table["userId"]))[:4]]
    mids = [int(m) for m in np.unique(np.asarray(table["movieId"]))[:10]]
    scorer.prepare_wave(mids, k=4)
    wave = scorer.score_wave(uids)
    many = scorer.score_many(uids, mids)
    np.testing.assert_allclose(wave, many, rtol=1e-5, atol=1e-6)

    # A store write to a candidate's mf: hash must flow into the NEXT wave
    # (resident block rebuilt), keeping wave == fresh score_many. Distinct
    # movie/value from the module's earlier cache test (shared store).
    store.hset(f"mf:{mids[3]}", {"movieAvgRating": "7.77",
                                 "movieGenre1": "Horror"})
    wave2 = scorer.score_wave(uids)
    many2 = scorer.score_many(uids, mids)
    np.testing.assert_allclose(wave2, many2, rtol=1e-5, atol=1e-6)
    assert not np.allclose(wave2, wave)  # the write actually changed scores
