"""ALS collaborative-filtering tests."""

import numpy as np
import pytest

from sparrowrecsys_tpu.data.movielens import Ratings
from sparrowrecsys_tpu.models.als import ALSConfig, cross_validate, train_als


def block_ratings(n_users=40, n_items=30, seed=0, noise=0.1):
    """Low-rank ground truth: two taste groups x two item groups."""
    rng = np.random.default_rng(seed)
    u, m, r, t = [], [], [], []
    for uid in range(1, n_users + 1):
        taste = uid % 2
        for mid in rng.choice(np.arange(1, n_items + 1), size=12, replace=False):
            group = mid % 2
            base = 4.5 if taste == group else 1.5
            u.append(uid); m.append(int(mid))
            r.append(np.clip(base + noise * rng.normal(), 0.5, 5.0))
            t.append(len(u))
    return Ratings(
        np.array(u, np.int32), np.array(m, np.int32),
        np.array(r, np.float32), np.array(t, np.int64),
    )


@pytest.fixture(scope="module")
def split():
    ratings = block_ratings()
    rng = np.random.default_rng(1)
    mask = rng.random(len(ratings)) < 0.8
    def pick(sel):
        return Ratings(
            ratings.user_ids[sel], ratings.movie_ids[sel],
            ratings.ratings[sel], ratings.timestamps[sel],
        )
    return pick(mask), pick(~mask)


def test_als_fits_low_rank_structure(split):
    train, test = split
    model = train_als(train, ALSConfig(rank=4))
    rmse = model.rmse(test)
    assert rmse < 0.6, rmse  # block structure is rank-2; ALS must nail it


def test_cold_start_drop(split):
    train, _ = split
    model = train_als(train, ALSConfig(rank=4))
    unseen = Ratings(
        np.array([9999], np.int32), np.array([1], np.int32),
        np.array([3.0], np.float32), np.array([0], np.int64),
    )
    pred, actual = model.transform_drop(unseen)
    assert len(pred) == 0  # dropped, not NaN-propagated


def test_recommendations_rank_preferred_group(split):
    train, _ = split
    model = train_als(train, ALSConfig(rank=4))
    recs = model.recommend_for_all_users(10)
    # user 2 (taste 0) should mostly get even movie ids.
    top = [mid for mid, _ in recs[2]]
    even = sum(1 for mid in top if mid % 2 == 0)
    assert even >= 8, top


def test_recommend_subset(split):
    train, _ = split
    model = train_als(train, ALSConfig(rank=4))
    subset = model.recommend_for_user_subset([1, 2, 424242], k=5)
    assert set(subset) == {1, 2}
    assert len(subset[1]) == 5


def test_chunked_solve_matches_direct(split, monkeypatch):
    """The >4M-event chunked normal-equation accumulation is the same math
    as the single-shot solve (f32 summation order aside)."""
    import sparrowrecsys_tpu.models.als as als_mod

    train, _ = split
    direct = train_als(train, ALSConfig(max_iter=2))
    monkeypatch.setattr(als_mod, "ALS_CHUNK_EVENTS", 64)  # force many chunks
    chunked = train_als(train, ALSConfig(max_iter=2))
    # Factors drift by f32 summation order over iterations; the identified
    # quantity is the prediction surface.
    pd = direct.predict(train.user_ids, train.movie_ids)
    pc = chunked.predict(train.user_ids, train.movie_ids)
    np.testing.assert_allclose(pd, pc, rtol=0, atol=5e-3)


def test_cross_validate_returns_grid(split):
    train, _ = split
    out = cross_validate(train, ALSConfig(rank=4, max_iter=3), reg_grid=(0.01,),
                         num_folds=3)
    assert set(out) == {0.01}
    assert np.isfinite(out[0.01])
