"""Tests for the leave-one-out retrieval protocol + tuned-blend machinery
(tools/recall_eval.py).

The bundled 22k-event sample cannot support personalization above
popularity (BASELINE.md, tools/retrieval_exp.py), so the blend's value
can't be demonstrated on real data — these tests plant a synthetic
cluster structure instead and assert the validation-tuned blend finds it
(beta > 0, beats popularity on the untouched test split), plus the
protocol invariants the honest numbers rest on.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparrowrecsys_tpu.data.movielens import Ratings
from tools import recall_eval as re_


def _ratings(events):
    """events: list of (user, movie, rating, ts)."""
    a = np.array(events)
    return Ratings(
        a[:, 0].astype(np.int32), a[:, 1].astype(np.int32),
        a[:, 2].astype(np.float32), a[:, 3].astype(np.int64),
    )


class TestLeaveOneOutSplit:
    def test_last_positive_held_out(self):
        r = _ratings([
            (1, 10, 5.0, 100), (1, 11, 4.0, 200), (1, 12, 2.0, 300),
        ])
        train, test_pairs, seen = re_.leave_one_out_split(r)
        # last POSITIVE (ts 200, movie 11) is the test item, not the
        # temporally-last negative (movie 12)
        assert test_pairs == [(1, 11)]
        assert set(train.movie_ids.tolist()) == {10, 12}
        assert seen[1].tolist() == [10, 12]

    def test_single_positive_user_is_train_only(self):
        r = _ratings([(1, 10, 5.0, 100), (1, 11, 2.0, 200)])
        train, test_pairs, _ = re_.leave_one_out_split(r)
        assert test_pairs == []
        assert len(train) == 2

    def test_ts_tie_broken_stably(self):
        r = _ratings([(1, 10, 5.0, 100), (1, 11, 5.0, 100)])
        _, test_pairs, _ = re_.leave_one_out_split(r)
        # stable lexsort: the later-row event wins the tie
        assert test_pairs == [(1, 11)]


class TestRecallAtK:
    def test_seen_items_masked(self):
        scores = np.array([9.0, 8.0, 7.0, 1.0], np.float32)
        rows = {1: scores}
        seen = {1: np.array([0, 1])}
        # top-1 without masking would be item 0; with seen-masking it's 2
        assert re_.recall_at_k(rows, [(1, 2)], seen, 1) == 1.0
        assert re_.recall_at_k(rows, [(1, 0)], seen, 1) == 0.0

    def test_out_of_catalog_seen_ids_ignored(self):
        rows = {1: np.array([5.0, 4.0, 3.0, 2.0], np.float32)}
        seen = {1: np.array([2, 9999])}  # 9999 outside the catalog
        assert re_.recall_at_k(rows, [(1, 0)], seen, 2) == 1.0
        # item 2 is seen -> masked out of the top-2 (item 3 takes its place)
        assert re_.recall_at_k(rows, [(1, 2)], seen, 2) == 0.0

    def test_unscored_user_skipped(self):
        assert re_.recall_at_k({}, [(7, 0)], {}, 1) == 0.0


def _cluster_ratings(n_users=60, n_items=40, seed=0):
    """Two user clusters, each exclusively consuming one half of the
    catalog; within-cluster popularity uniform. Global popularity can't
    tell which half a user belongs to — personalization can."""
    rng = np.random.default_rng(seed)
    events = []
    for u in range(1, n_users + 1):
        half = (u % 2) * (n_items // 2)
        items = rng.choice(n_items // 2, size=6, replace=False) + half
        for i, it in enumerate(items):
            events.append((u, int(it) + 1, 5.0, 1000 + 10 * u + i))
    return _ratings(events)


class TestTunedBlend:
    def test_finds_planted_personalization(self, monkeypatch):
        r = _cluster_ratings()
        train, test_pairs, seen = re_.leave_one_out_split(r)
        assert len(test_pairs) >= 50

        def planted_vectors(tr):
            # cluster-aligned unit vectors: items 1..20 -> e0, 21..40 -> e1
            fn = np.zeros((re_.N_ITEMS, 2), np.float32)
            have = np.zeros(re_.N_ITEMS, bool)
            for item in range(1, 41):
                fn[item] = [1.0, 0.0] if item <= 20 else [0.0, 1.0]
                have[item] = True
            return fn, have

        monkeypatch.setattr(re_, "_item2vec_item_vectors", planted_vectors)
        pop = re_.eval_popularity(train, test_pairs, seen, 10)
        blend, beta = re_.eval_tuned_blend(train, test_pairs, seen, 10)
        assert beta > 0, "validation sweep must select personalization"
        assert blend > pop + 0.1, (blend, pop)

    def test_neutral_items_fall_back_to_popularity(self, monkeypatch):
        # no item has an embedding -> every beta scores identically to
        # popularity, and the blend must EQUAL the popularity recall
        r = _cluster_ratings()
        train, test_pairs, seen = re_.leave_one_out_split(r)

        def no_vectors(tr):
            return (np.zeros((re_.N_ITEMS, 2), np.float32),
                    np.zeros(re_.N_ITEMS, bool))

        monkeypatch.setattr(re_, "_item2vec_item_vectors", no_vectors)
        pop = re_.eval_popularity(train, test_pairs, seen, 10)
        blend, _ = re_.eval_tuned_blend(train, test_pairs, seen, 10)
        assert blend == pytest.approx(pop, abs=0.05)
