"""Device feature pipeline vs the numpy reference implementation.

`build_samples_device` must be BIT-IDENTICAL to `build_samples` on every
column: all heavy stages run as one jitted XLA program with integer-exact
moments (ratings on the 0.5 grid as 2r int32, years offset), and the
final f64 divides/roundings run on host from those exact moments — so
agreement is by construction, and these tests police it.
"""

import numpy as np
import pytest

from sparrowrecsys_tpu.data import load_movies, ratings_from_samples_csv
from sparrowrecsys_tpu.data.device_pipeline import (
    build_samples_device,
    device_feature_columns,
)
from sparrowrecsys_tpu.data.feature_pipeline import build_samples
from sparrowrecsys_tpu.data.movielens import MovieCatalog
from sparrowrecsys_tpu.data.synthetic import SyntheticSpec, synthetic_ratings
from tests.conftest import REPO_DATA


def _assert_tables_equal(a, b):
    assert set(a.columns) == set(b.columns)
    assert len(a) == len(b)
    for k in a.columns:
        va, vb = a[k], b[k]
        assert va.dtype == vb.dtype, (k, va.dtype, vb.dtype)
        neq = int(np.sum(va != vb))
        assert neq == 0, f"{k}: {neq}/{len(va)} rows differ"


@pytest.fixture(scope="module")
def real_data():
    import os

    ratings = ratings_from_samples_csv(
        os.path.join(REPO_DATA, "goldenTestSamples.csv")
    )
    catalog = load_movies(os.path.join(REPO_DATA, "movies.csv"))
    return ratings, catalog


class TestDevicePipelineParity:
    def test_real_sample_bit_exact(self, real_data):
        ratings, catalog = real_data
        _assert_tables_equal(
            build_samples(ratings, catalog),
            build_samples_device(ratings, catalog),
        )

    def test_synthetic_bit_exact(self):
        ratings = synthetic_ratings(SyntheticSpec(2000, 500, 100_000))
        ids = np.arange(1, 501, dtype=np.int32)
        catalog = MovieCatalog(
            movie_ids=ids,
            titles=[f"M{i}" for i in ids],
            release_years=(1950 + ids % 70).astype(np.int32),
            genres=[["Action", "Drama"] if i % 2 else ["Comedy"] for i in ids],
            id_to_row={int(i): k for k, i in enumerate(ids)},
            genre_index={},
        )
        _assert_tables_equal(
            build_samples(ratings, catalog),
            build_samples_device(ratings, catalog),
        )

    def test_long_history_bit_exact(self, real_data):
        ratings, catalog = real_data
        _assert_tables_equal(
            build_samples(ratings, catalog, history_length=16),
            build_samples_device(ratings, catalog, history_length=16),
        )

    def test_chunked_genre_stage_bit_exact(self, real_data):
        # Force the lax.map halo path (production trigger: > 2M rows,
        # where the direct [n, V] cumsum OOMs a 16 GB v5e at 20M events)
        # with a chunk far smaller than the 22k-row sample. Must be
        # bit-identical to the numpy pipeline, chunk boundaries included.
        ratings, catalog = real_data
        _assert_tables_equal(
            build_samples(ratings, catalog),
            build_samples_device(ratings, catalog, genre_chunk=1000),
        )

    def test_chunked_genre_stage_awkward_boundary(self):
        # Chunk size NOT dividing n, single heavy user spanning many
        # chunks (window must ride the halo across boundaries).
        rng = np.random.default_rng(7)
        n = 5003
        from sparrowrecsys_tpu.data.movielens import Ratings

        uid = np.sort(rng.integers(1, 8, n)).astype(np.int32)
        ratings = Ratings(
            user_ids=uid,
            movie_ids=rng.integers(1, 40, n).astype(np.int32),
            ratings=(rng.integers(1, 11, n) * 0.5).astype(np.float32),
            timestamps=rng.permutation(n).astype(np.int64),
        )
        ids = np.arange(1, 41, dtype=np.int32)
        catalog = MovieCatalog(
            movie_ids=ids,
            titles=[f"M{i}" for i in ids],
            release_years=(1950 + ids % 70).astype(np.int32),
            genres=[["Action", "Drama"] if i % 2 else ["Comedy"] for i in ids],
            id_to_row={int(i): k for k, i in enumerate(ids)},
            genre_index={},
        )
        _assert_tables_equal(
            build_samples(ratings, catalog),
            build_samples_device(ratings, catalog, genre_chunk=512),
        )

    def test_device_columns_stay_on_device(self, real_data):
        import jax

        ratings, catalog = real_data
        cols = device_feature_columns(ratings, catalog)
        lbl = cols["label"]
        assert isinstance(lbl, jax.Array)
        # the f32 stat columns exist on device for pure-device consumers
        assert cols["movieAvgRating"].dtype == np.float32


class TestEncodeSamplesDevice:
    def test_matches_host_encode(self, real_data):
        import jax

        from sparrowrecsys_tpu.data.dataset import encode_samples
        from sparrowrecsys_tpu.data.device_pipeline import (
            encode_samples_device,
        )

        ratings, catalog = real_data
        host = encode_samples(build_samples(ratings, catalog))
        dev = encode_samples_device(device_feature_columns(ratings, catalog))
        assert set(host.features) == set(dev.features)
        assert len(host) == len(dev)
        assert isinstance(dev.labels, jax.Array)
        np.testing.assert_array_equal(host.labels, np.asarray(dev.labels))
        for k, hv in host.features.items():
            dv = np.asarray(dev.features[k])
            assert dv.dtype == hv.dtype, k
            if hv.dtype == np.float32:
                # Device f32 moment math can flip a HALF_UP tie (one 0.01
                # rounding step) on a handful of cells vs the host f64
                # recompute; anything beyond that is a real bug.
                diff = np.abs(dv - hv)
                flipped = int(np.sum(diff > 1e-6))
                assert diff.max() <= 0.01 + 1e-6, k
                assert flipped <= max(2, len(hv) // 1000), (k, flipped)
            else:
                np.testing.assert_array_equal(dv, hv, err_msg=k)

    def test_max_rows_matches_select(self, real_data):
        from sparrowrecsys_tpu.data.dataset import encode_samples
        from sparrowrecsys_tpu.data.device_pipeline import (
            encode_samples_device,
        )

        ratings, catalog = real_data
        table = build_samples(ratings, catalog)
        host = encode_samples(table.select(np.arange(1000)))
        dev = encode_samples_device(
            device_feature_columns(ratings, catalog), max_rows=1000
        )
        assert len(dev) == 1000
        np.testing.assert_array_equal(
            host.features["movieId"], np.asarray(dev.features["movieId"])
        )
        np.testing.assert_array_equal(host.labels, np.asarray(dev.labels))

    def test_trainer_fit_consumes_device_dataset(self, real_data):
        from sparrowrecsys_tpu.config import TrainConfig
        from sparrowrecsys_tpu.data.device_pipeline import (
            encode_samples_device,
        )
        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.training.loop import Trainer

        ratings, catalog = real_data
        ds = encode_samples_device(
            device_feature_columns(ratings, catalog), max_rows=2048
        )
        trainer = Trainer(
            build_model("deepfm"),
            TrainConfig(batch_size=512, epochs=1),
        )
        res = trainer.fit(ds, verbose=False)
        assert np.isfinite(res.history[-1]["loss"])


class TestDevicePipelineSharded:
    """The feature plane scales multi-chip: events sharded over the data
    axis flow through the same jitted program (XLA inserts the sort /
    segment collectives), and the resident encode feeds the sharded
    trainer end-to-end — no host table anywhere."""

    def test_device_columns_from_sharded_events(self, real_data):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from sparrowrecsys_tpu.config import MeshConfig
        from sparrowrecsys_tpu.parallel.mesh import build_mesh

        ratings, catalog = real_data
        plan = build_mesh(MeshConfig(model_parallel=1))
        # truncate to a device-divisible event count (demo simplicity)
        n = len(ratings.user_ids)
        n -= n % plan.mesh.devices.size
        from sparrowrecsys_tpu.data.movielens import Ratings

        sub = Ratings(
            ratings.user_ids[:n], ratings.movie_ids[:n],
            ratings.ratings[:n], ratings.timestamps[:n],
        )
        host = build_samples(sub, catalog)

        sharding = NamedSharding(plan.mesh, P(plan.data_axis))
        shard = lambda x: jax.device_put(x, sharding)  # noqa: E731
        sub_sharded = Ratings(
            shard(sub.user_ids.astype(np.int32)),
            shard(sub.movie_ids.astype(np.int32)),
            shard(sub.ratings.astype(np.float32)),
            shard(sub.timestamps),
        )
        dev = build_samples_device(sub_sharded, catalog)
        _assert_tables_equal(host, dev)

    def test_sharded_trainer_consumes_device_dataset(self, real_data):
        from sparrowrecsys_tpu.config import MeshConfig, TrainConfig
        from sparrowrecsys_tpu.data.device_pipeline import (
            encode_samples_device,
        )
        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.parallel.mesh import build_mesh
        from sparrowrecsys_tpu.training.loop import Trainer

        ratings, catalog = real_data
        ds = encode_samples_device(
            device_feature_columns(ratings, catalog), max_rows=2048
        )
        plan = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
        trainer = Trainer(
            build_model("deepfm"),
            TrainConfig(batch_size=512, epochs=1),
            plan=plan,
        )
        res = trainer.fit(ds, verbose=False)
        assert np.isfinite(res.history[-1]["loss"])
