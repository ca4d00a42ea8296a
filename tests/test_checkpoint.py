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


class TestTrainStateResume:
    """Full train-state checkpoint/resume (params + Adam moments + epoch
    cursor): a run interrupted after 2 of 4 epochs and resumed must land
    bitwise on the uninterrupted run's params — the per-epoch shuffle key
    is PRNGKey(seed + epoch), so the batch schedule replays exactly."""

    def _dataset(self, n=256):
        from sparrowrecsys_tpu.data.dataset import EncodedDataset

        rng = np.random.default_rng(0)
        feats = {
            "movieId": rng.integers(1, 100, n).astype(np.int32),
            "userId": rng.integers(1, 100, n).astype(np.int32),
        }
        labels = (rng.random(n) > 0.5).astype(np.float32)
        return EncodedDataset(feats, labels)

    def _leaves(self, params):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]

    def test_resume_matches_uninterrupted(self, tmp_path):
        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = self._dataset()
        cfg = TrainConfig(batch_size=64, epochs=4, seed=3)

        full = Trainer(build_model("neuralcf"), cfg).fit(ds, verbose=False)

        d = str(tmp_path / "state")
        t1 = Trainer(build_model("neuralcf"), cfg)
        t1.fit(ds, epochs=2, state_dir=d, verbose=False)
        # resumed trainer: fresh object, restores params+opt+epoch cursor
        t2 = Trainer(build_model("neuralcf"), cfg)
        res = t2.fit(ds, state_dir=d, resume=True, verbose=False)

        for a, b in zip(self._leaves(full.params), self._leaves(res.params)):
            np.testing.assert_array_equal(a, b)

    def test_resume_skips_completed_epochs(self, tmp_path):
        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = self._dataset()
        cfg = TrainConfig(batch_size=64, epochs=2, seed=0)
        d = str(tmp_path / "state")
        t1 = Trainer(build_model("neuralcf"), cfg)
        r1 = t1.fit(ds, state_dir=d, verbose=False)
        # everything already done: resume trains zero epochs and returns
        # the checkpointed params unchanged
        t2 = Trainer(build_model("neuralcf"), cfg)
        r2 = t2.fit(ds, state_dir=d, resume=True, verbose=False)
        for a, b in zip(self._leaves(r1.params), self._leaves(r2.params)):
            np.testing.assert_array_equal(a, b)

    def test_resume_without_checkpoint_cold_starts(self, tmp_path):
        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = self._dataset()
        cfg = TrainConfig(batch_size=64, epochs=1, seed=0)
        t = Trainer(build_model("neuralcf"), cfg)
        res = t.fit(
            ds, state_dir=str(tmp_path / "none"), resume=True, verbose=False
        )
        assert res.history  # trained from scratch without raising

    def test_resume_from_params_only_export_raises(self, tmp_path):
        # A params-only export under --state-dir is a misconfiguration:
        # resuming must surface NotATrainStateError, NOT silently cold
        # start with fresh params.
        import pytest

        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.training.checkpoint import (
            NotATrainStateError,
            save,
        )
        from sparrowrecsys_tpu.training.loop import Trainer

        ds = self._dataset()
        cfg = TrainConfig(batch_size=64, epochs=1, seed=0)
        t = Trainer(build_model("neuralcf"), cfg)
        params = t.init_params(ds.features)
        d = str(tmp_path / "export")
        save(params, d)  # params.msgpack only, no opt_state
        t2 = Trainer(build_model("neuralcf"), cfg)
        with pytest.raises(NotATrainStateError):
            t2.fit(ds, state_dir=d, resume=True, verbose=False)
