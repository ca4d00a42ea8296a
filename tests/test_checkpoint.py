"""Versioned checkpoint tests."""

import os

import jax
import numpy as np
import pytest

from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.training.checkpoint import load_latest, save


@pytest.fixture
def neuralcf_params():
    model = build_model("neuralcf")
    feats = {"movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)}
    return model, model.init(jax.random.PRNGKey(0), feats)["params"]


def test_save_load_round_trip(neuralcf_params, tmp_path):
    model, params = neuralcf_params
    d = str(tmp_path / "neuralcf")
    vdir = save(params, d, meta={"model": "neuralcf"})
    assert vdir.endswith("001")
    restored, version, meta = load_latest(d, params)
    assert version == 1 and meta == {"model": "neuralcf"}
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb))


def test_version_increment_and_latest_wins(neuralcf_params, tmp_path):
    model, params = neuralcf_params
    d = str(tmp_path / "m")
    save(params, d)
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    save(bumped, d)
    assert sorted(os.listdir(d)) == ["001", "002"]
    restored, version, _ = load_latest(d, params)
    assert version == 2
    leaf = jax.tree_util.tree_leaves(restored)[0]
    orig = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(orig) + 1.0)


def test_keep_prunes_old_versions(neuralcf_params, tmp_path):
    model, params = neuralcf_params
    d = str(tmp_path / "m")
    for _ in range(5):
        save(params, d, keep=3)
    assert sorted(os.listdir(d)) == ["003", "004", "005"]


def test_scorer_from_checkpoint(neuralcf_params, tmp_path):
    from sparrowrecsys_tpu.serving.rankers import ModelScorer

    model, params = neuralcf_params
    d = str(tmp_path / "neuralcf")
    save(params, d)
    scorer = ModelScorer.from_checkpoint(model, d, batch_pad=8)
    out = scorer.score(5, [1, 2, 3])
    assert out.shape == (3,) and np.all((out >= 0) & (out <= 1))
