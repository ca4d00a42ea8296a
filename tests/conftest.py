"""Test fixtures: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is validated on virtual CPU devices
(`--xla_force_host_platform_device_count=8`); real-TPU runs happen via
bench.py / the driver.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax and pins JAX_PLATFORMS=axon before
# pytest starts, so env vars are too late — override via the config API.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Vendored data assets (data/): goldenTestSamples.csv is the reference's
# 22,440-row testSamples.csv snapshot — the 27-column schema oracle for
# golden-row tests. movies.csv/links.csv are the MovieLens-small catalog
# cut. The repo is self-contained: no test or runtime path reads the
# read-only reference mount.
REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


@pytest.fixture(scope="session")
def reference_test_samples_path():
    path = os.path.join(REPO_DATA, "goldenTestSamples.csv")
    assert os.path.exists(path), "vendored golden testSamples missing"
    return path


@pytest.fixture(scope="session")
def reference_movies_path():
    path = os.path.join(REPO_DATA, "movies.csv")
    assert os.path.exists(path), "vendored movies.csv missing"
    return path


@pytest.fixture(scope="session")
def repo_data_root():
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    return root


@pytest.fixture
def tiny_catalog():
    """Three movies with known years/genres for hand-computed tests."""
    from sparrowrecsys_tpu.data.movielens import MovieCatalog

    return MovieCatalog(
        movie_ids=np.array([1, 2, 3], dtype=np.int32),
        titles=["A", "B", "C"],
        release_years=np.array([2000, 2010, 1990], dtype=np.int32),
        genres=[["Action", "Comedy"], ["Action"], ["Drama"]],
        id_to_row={1: 0, 2: 1, 3: 2},
        genre_index={"Action": [1, 2], "Comedy": [1], "Drama": [3]},
    )


@pytest.fixture
def tiny_ratings():
    from sparrowrecsys_tpu.data.movielens import Ratings

    return Ratings(
        user_ids=np.array([1, 1, 1, 1], dtype=np.int32),
        movie_ids=np.array([1, 2, 3, 1], dtype=np.int32),
        ratings=np.array([4.0, 3.0, 5.0, 4.0], dtype=np.float32),
        timestamps=np.array([1, 2, 3, 4], dtype=np.int64),
    )
