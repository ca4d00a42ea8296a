"""Utils + misc coverage: observability, profiling timer, A/B spread,
cross-feature hash distribution, standardize transform."""

import numpy as np

from sparrowrecsys_tpu.utils.observability import MetricsRegistry
from sparrowrecsys_tpu.utils.profiling import StepTimer


def test_metrics_registry():
    reg = MetricsRegistry()
    reg.incr("requests")
    reg.incr("requests", 2)
    reg.gauge("qps", 10.5)
    snap = reg.snapshot()
    assert snap["counters"]["requests"] == 3
    assert snap["gauges"]["qps"] == 10.5
    assert snap["uptime_sec"] >= 0


def test_step_timer():
    t = StepTimer(batch_size=100)
    t.tick()
    t.tick()
    assert t.step_time is not None and t.examples_per_sec > 0


def test_ab_bucket_spread():
    """Hash bucketing should spread numeric user ids across all outcomes."""
    from sparrowrecsys_tpu.serving.ab import get_config_by_user_id

    outcomes = [get_config_by_user_id(str(i)) for i in range(1000)]
    n_b = outcomes.count("nerualcf")
    # bucket B is hash%5==1 -> about 20%
    assert 100 < n_b < 320, n_b


def test_cross_hash_distribution():
    import jax.numpy as jnp

    from sparrowrecsys_tpu.models.wide_deep import cross_hash

    a = jnp.asarray(np.random.default_rng(0).integers(0, 1001, 20000))
    b = jnp.asarray(np.random.default_rng(1).integers(0, 1001, 20000))
    h = np.asarray(cross_hash(a, b, 10000))
    assert h.min() >= 0 and h.max() < 10000
    # rough uniformity: no bucket grabs more than ~0.2% of mass
    _, counts = np.unique(h, return_counts=True)
    assert counts.max() < 40


def test_standardize_uses_train_stats():
    from sparrowrecsys_tpu.data.dataset import EncodedDataset, standardize

    feats = {"releaseYear": np.array([1990.0, 2010.0], np.float32)}
    for c in ("movieRatingCount", "movieAvgRating", "movieRatingStddev",
              "userRatingCount", "userAvgRating", "userRatingStddev",
              "userAvgReleaseYear", "userReleaseYearStddev"):
        feats[c] = np.zeros(2, np.float32)
    train = EncodedDataset(dict(feats), np.zeros(2, np.float32))
    test_feats = dict(feats)
    test_feats["releaseYear"] = np.array([2000.0], np.float32)
    test = EncodedDataset(test_feats, np.zeros(1, np.float32))
    tr, te = standardize(train, test)
    np.testing.assert_allclose(tr.features["releaseYear"], [-1.0, 1.0])
    np.testing.assert_allclose(te.features["releaseYear"], [0.0])  # train stats


def test_config_json_round_trip(tmp_path):
    from sparrowrecsys_tpu.config import (
        SparrowConfig,
        TrainConfig,
        config_from_json,
        config_to_json,
    )

    cfg = SparrowConfig(train=TrainConfig(batch_size=4096))
    p = str(tmp_path / "cfg.json")
    config_to_json(cfg, p)
    cfg2 = config_from_json(p)
    assert cfg2.train.batch_size == 4096
    assert cfg2.serving.neuralcf_aliases == ("neuralcf", "nerualcf")


def test_config_json_rejects_unknown_keys(tmp_path):
    import json

    import pytest as _pytest

    from sparrowrecsys_tpu.config import config_from_json

    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"train": {"batch_sizee": 1}}, f)
    with _pytest.raises(ValueError):
        config_from_json(p)


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from sparrowrecsys_tpu.utils.profiling import trace

    with trace(str(tmp_path / "trace")):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert float(x[0, 0]) == 64.0
    import os

    assert any(os.scandir(str(tmp_path / "trace")))  # something was written
