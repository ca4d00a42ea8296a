"""Native C++ loader parity tests (skipped when no toolchain)."""

import os

import numpy as np
import pytest

from sparrowrecsys_tpu.native import (
    load_embeddings_native,
    load_ratings_native,
    native_available,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_ratings_parity(tmp_path):
    from sparrowrecsys_tpu.data.movielens import load_ratings

    path = tmp_path / "ratings.csv"
    path.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,10,4.5,100\n"
        "garbage,row\n"        # skipped
        "2,20,3.0,200\n"
        "3,30,5,300\n"          # integer rating string
    )
    n = load_ratings_native(str(path))
    assert len(n) == 3
    assert n.user_ids.tolist() == [1, 2, 3]
    assert n.ratings.tolist() == [4.5, 3.0, 5.0]
    assert n.timestamps.tolist() == [100, 200, 300]


@needs_native
def test_embeddings_parity(tmp_path):
    from sparrowrecsys_tpu.embedding.artifacts import (
        load_embeddings_csv,
        write_embeddings_csv,
    )

    path = str(tmp_path / "emb.csv")
    vecs = np.random.default_rng(1).normal(size=(37, 10)).astype(np.float32)
    ids = np.arange(100, 137)
    write_embeddings_csv(path, ids, vecs)
    a = load_embeddings_native(path)
    b = load_embeddings_csv(path)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6)


@needs_native
def test_bundled_ratings_match_python(repo_data_root):
    import os

    from sparrowrecsys_tpu.data.movielens import load_ratings

    path = os.path.join(repo_data_root, "ratings.csv")
    if not os.path.exists(path):
        pytest.skip("no bundled ratings.csv")
    a = load_ratings_native(path)
    b = load_ratings(path)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a.user_ids, b.user_ids)
    np.testing.assert_array_equal(a.movie_ids, b.movie_ids)
    np.testing.assert_allclose(a.ratings, b.ratings)


@needs_native
def test_embeddings_reject_inconsistent_widths(tmp_path):
    """Rows wider or narrower than the probed dim are skipped, never
    silently truncated (review regression)."""
    path = tmp_path / "bad.csv"
    path.write_text("1:0.5 0.5\n2:1.0 2.0 3.0\n3:0.25 0.75\n")
    out = load_embeddings_native(str(path))
    assert set(out) == {1, 3}
    np.testing.assert_allclose(out[3], [0.25, 0.75])


@needs_native
def test_exponent_floats_parse(tmp_path):
    path = tmp_path / "exp.csv"
    path.write_text("7:1.5e-3 -2E2 3e+1\n")
    out = load_embeddings_native(str(path))
    np.testing.assert_allclose(out[7], [0.0015, -200.0, 30.0], rtol=1e-6)


@needs_native
def test_samples_native_matches_python(repo_data_root):
    """load_samples_native must produce byte-identical columns to the
    pure-Python load_samples_csv on the 22,440-row golden file."""
    from sparrowrecsys_tpu.data.dataset import load_samples_csv
    from sparrowrecsys_tpu.native import load_samples_native

    path = os.path.join(repo_data_root, "goldenTestSamples.csv")
    a = load_samples_native(path)
    b = load_samples_csv(path)
    assert len(a) == len(b) == 22440
    assert set(a.columns) == set(b.columns)
    for k in b.columns:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        assert a[k].dtype == b[k].dtype, k


@needs_native
def test_samples_native_short_rows_skipped(tmp_path):
    """Rows with missing fields are skipped (ignore_errors parity); empty
    genre/history fields parse to -1 / 0."""
    from sparrowrecsys_tpu.data.schema import SAMPLE_COLUMNS
    from sparrowrecsys_tpu.native import load_samples_native

    header = ",".join(SAMPLE_COLUMNS)
    good = "1,2,3.5,1000,1,1995,Action,,,10,3.50,0.5,0,0,0,0,0,5,1995,0.1,3.2,0.4,Comedy,,,,"
    short = "9,9,1.0"
    path = tmp_path / "s.csv"
    path.write_text(header + "\n" + good + "\n" + short + "\n")
    t = load_samples_native(str(path))
    assert len(t) == 1
    assert t["movieId"][0] == 1 and t["userId"][0] == 2
    assert t["movieGenre1"][0] >= 0      # "Action" resolves
    assert t["movieGenre2"][0] == -1     # empty genre -> OOV
    assert t["userRatedMovie1"][0] == 0  # empty history -> 0


def test_samples_python_fallback_short_rows_skipped(tmp_path):
    """The pure-Python fallback must skip truncated rows exactly like the
    native parser (transparent-fallback equality)."""
    from sparrowrecsys_tpu.data.dataset import load_samples_csv
    from sparrowrecsys_tpu.data.schema import SAMPLE_COLUMNS

    header = ",".join(SAMPLE_COLUMNS)
    good = "1,2,3.5,1000,1,1995,Action,,,10,3.50,0.5,0,0,0,0,0,5,1995,0.1,3.2,0.4,Comedy,,,,"
    short = "9,9,1.0"
    path = tmp_path / "s.csv"
    path.write_text(header + "\n" + good + "\n" + short + "\n")
    t = load_samples_csv(str(path))
    assert len(t) == 1
    assert t["movieId"][0] == 1 and t["userId"][0] == 2


@needs_native
def test_samples_native_python_agree_on_noncanonical(tmp_path):
    """The fast path and the 'transparent fallback' must return the SAME
    table on non-canonical inputs too: a header with extra trailing
    non-sample columns whose data rows stop at the last sample column,
    trailing-junk numerics ('12abc'), and 'nan'/'inf' tokens (all
    garbage -> 0, never NaN)."""
    from sparrowrecsys_tpu.data.dataset import load_samples_csv
    from sparrowrecsys_tpu.data.schema import SAMPLE_COLUMNS
    from sparrowrecsys_tpu.native import load_samples_native

    header = ",".join(list(SAMPLE_COLUMNS) + ["extraA", "extraB"])
    # full row including the extra columns
    full = ("1,2,3.5,1000,1,1995,Action,,,10,3.50,0.5,0,0,0,0,0,5,1995,"
            "0.1,3.2,0.4,Comedy,,,,,x,y")
    # row that stops at the last sample column (csv fallback keeps it)
    stops = ("3,4,4.0,1200,1,1990,Drama,,,7,4.00,0.2,0,0,0,0,0,3,1990,"
             "0.2,4.0,0.3,Drama,,,,")
    # garbage numerics: trailing junk + non-finite tokens
    junk = ("12abc,6,nan,1400,1,inf,Action,,,1e400,3.00,0.1,0,0,0,0,0,2,"
            "1985,0.0,3.0,0.0,Action,,,,")
    # genuinely short row (missing sample columns): both must skip it
    short = "9,9,1.0"
    path = tmp_path / "s.csv"
    path.write_text("\n".join([header, full, stops, junk, short]) + "\n")

    a = load_samples_native(str(path))
    b = load_samples_csv(str(path))
    assert len(a) == len(b) == 3
    for k in b.columns:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # '12abc' / 'nan' / 'inf' / '1e400' all parse to 0 in both loaders
    assert a["movieId"][2] == 0
    assert a["rating"][2] == 0.0
    assert a["releaseYear"][2] == 0
    assert a["movieRatingCount"][2] == 0
