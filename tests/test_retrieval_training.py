"""Retrieval (in-batch softmax) trainer tests."""

import numpy as np
import pytest

from sparrowrecsys_tpu.data.dataset import EncodedDataset
from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.retrieval import RetrievalConfig, RetrievalTrainer


def taste_dataset(n=4096, n_users=200, n_movies=100, seed=0):
    """Users watch only their taste group's movies — perfect retrieval
    structure the towers must recover."""
    rng = np.random.default_rng(seed)
    users = rng.integers(1, n_users + 1, n).astype(np.int32)
    group = users % 2
    movies = (
        rng.integers(0, n_movies // 2, n) * 2 + group + 1
    ).astype(np.int32)  # same parity as user group
    feats = {"userId": users, "movieId": movies}
    labels = np.ones(n, np.float32)
    return EncodedDataset(feats, labels)


def test_towers_learn_taste_groups():
    import jax

    ds = taste_dataset()
    model = build_model("neuralcf_two_tower", hidden=(16, 16))
    trainer = RetrievalTrainer(model, RetrievalConfig(batch_size=512, epochs=15))
    params = trainer.fit(ds)
    items = np.asarray(trainer.item_matrix(params, 101))
    # users in group 0 watch odd ids (2k+1 parity calc: group 0 -> movies 2j+1)
    u = trainer.user_vectors(params, [2, 4, 6])  # group 0 users
    scores = np.asarray(u) @ items.T
    top20 = np.argsort(-scores, axis=1)[:, :20]
    # ids are 1..100; group-0 users watched odd movie ids
    frac_odd = np.mean(top20 % 2 == 1)
    assert frac_odd > 0.8, frac_odd


def test_fit_accepts_warm_start():
    ds = taste_dataset(512)
    model = build_model("neuralcf_two_tower", hidden=(8,))
    trainer = RetrievalTrainer(model, RetrievalConfig(batch_size=256, epochs=2))
    p1 = trainer.fit(ds)
    p2 = trainer.fit(ds, params=p1)  # warm start runs
    assert p2 is not None
