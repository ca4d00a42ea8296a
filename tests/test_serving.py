"""Serving-plane tests: catalog, pipelines, A/B, HTTP API + sidecar."""

import json
import os
import urllib.request

import numpy as np
import pytest

from sparrowrecsys_tpu.serving.ab import get_config_by_user_id, java_string_hashcode
from sparrowrecsys_tpu.serving.catalog import DataManager, Movie, Rating, User
from sparrowrecsys_tpu.serving.processes import RecForYouProcess, SimilarMovieProcess
from sparrowrecsys_tpu.serving.rankers import ModelScorer, similar_score


@pytest.fixture(scope="module")
def dm(tmp_path_factory):
    """Small synthetic universe: 6 movies, 3 users, embeddings aligned so
    movie 1 ~ movie 2 and user 1 ~ movie 1."""
    root = tmp_path_factory.mktemp("serving")
    movies = root / "movies.csv"
    movies.write_text(
        "movieId,title,genres\n"
        "1,Alpha (2000),Action|Comedy\n"
        "2,Beta (2001),Action\n"
        "3,Gamma (1999),Drama\n"
        "4,Delta (2005),Action|Drama\n"
        "5,Epsilon (2010),Comedy\n"
        "6,Zeta (1995),Drama|Romance\n"
    )
    links = root / "links.csv"
    links.write_text(
        "movieId,imdbId,tmdbId\n1,tt1,101\n2,tt2,102\n3,tt3,103\n"
    )
    ratings = root / "ratings.csv"
    rows = ["userId,movieId,rating,timestamp"]
    data = [
        (1, 1, 5.0, 10), (1, 2, 4.5, 11), (2, 1, 4.0, 12), (2, 3, 2.0, 13),
        (3, 4, 3.0, 14), (3, 5, 5.0, 15), (1, 6, 1.0, 16), (2, 5, 4.0, 17),
    ]
    rows += [f"{u},{m},{r},{t}" for u, m, r, t in data]
    ratings.write_text("\n".join(rows) + "\n")
    memb = root / "item2vecEmb.csv"
    memb.write_text(
        "1:1.0 0.0\n2:0.9 0.1\n3:0.0 1.0\n4:0.5 0.5\n5:0.8 0.2\n6:0.1 0.9\n"
    )
    uemb = root / "userEmb.csv"
    uemb.write_text("1:1.0 0.0\n2:0.2 0.8\n3:0.5 0.5\n")
    return DataManager().load_data(
        str(movies), str(links), str(ratings), str(memb), str(uemb)
    )


class TestCatalog:
    def test_movie_fields_and_links(self, dm):
        m = dm.get_movie_by_id(1)
        assert m.title == "Alpha" and m.release_year == 2000
        assert m.genres == ["Action", "Comedy"]
        assert m.imdb_id == "tt1" and m.tmdb_id == "101"

    def test_incremental_average(self, dm):
        m = dm.get_movie_by_id(1)  # ratings 5.0, 4.0
        assert m.rating_number == 2
        assert m.average_rating == pytest.approx(4.5)

    def test_user_stats(self, dm):
        u = dm.get_user_by_id(1)  # 5.0, 4.5, 1.0
        assert u.rating_count == 3
        assert u.highest_rating == 5.0 and u.lowest_rating == 1.0
        assert u.average_rating == pytest.approx((5.0 + 4.5 + 1.0) / 3)

    def test_genre_query_sorting(self, dm):
        top = dm.get_movies_by_genre("Action", 10, "rating")
        ids = [m.movie_id for m in top]
        assert ids[0] == 1  # avg 4.5 beats others
        by_year = dm.get_movies_by_genre("Action", 10, "releaseYear")
        assert by_year[0].movie_id == 4  # 2005 newest

    def test_unknown_genre_raises(self, dm):
        with pytest.raises(KeyError):
            dm.get_movies_by_genre("Nope", 5, "rating")

    def test_top_ratings_bounded_sorted(self):
        m = Movie(99)
        for i, s in enumerate([3.0, 5.0, 1.0, 4.0] + [2.0] * 10):
            m.add_rating(Rating(99, i, s, i))
        assert len(m.top_ratings) == 10
        scores = [r.score for r in m.top_ratings]
        assert scores == sorted(scores, reverse=True)

    def test_json_shapes(self, dm):
        mj = dm.get_movie_by_id(1).to_json()
        assert set(mj) == {
            "movieId", "title", "releaseYear", "imdbId", "tmdbId", "genres",
            "ratingNumber", "averageRating", "topRatings",
        }
        assert "rating" in mj["topRatings"][0]  # the wrapper shape
        uj = dm.get_user_by_id(1).to_json()
        assert set(uj) == {
            "userId", "ratings", "averageRating", "highestRating",
            "lowestRating", "ratingCount",
        }
        assert uj["ratings"][0]["rating"]["movieId"] in (1, 2, 6)


class TestABTest:
    def test_java_hashcode_parity(self):
        # Values computed with java.lang.String#hashCode semantics.
        assert java_string_hashcode("") == 0
        assert java_string_hashcode("a") == 97
        assert java_string_hashcode("abc") == 96354
        # 49*31^4 + 48*31^3 + 51*31^2 + 53*31 + 49
        assert java_string_hashcode("10351") == 46733200

    def test_buckets(self):
        assert get_config_by_user_id("") == "emb"
        # 46733200 % 5 == 0 -> bucket A
        assert get_config_by_user_id("10351") == "emb"
        # find ids hitting buckets 0 and 1
        found = {get_config_by_user_id(str(i)) for i in range(50)}
        assert "nerualcf" in found


class TestSimilarMovie:
    def test_candidates_exclude_self(self, dm):
        p = SimilarMovieProcess(dm)
        movie = dm.get_movie_by_id(1)
        cands = p.candidate_generator(movie)
        assert all(c.movie_id != 1 for c in cands)
        # union of Action + Comedy
        assert {c.movie_id for c in cands} == {2, 4, 5}

    def test_emb_ranking_puts_similar_first(self, dm):
        p = SimilarMovieProcess(dm)
        out = p.get_rec_list(1, 3, "emb")
        assert out[0].movie_id == 2  # (0.9, 0.1) closest to (1, 0)

    def test_heuristic_score_formula(self, dm):
        a, b = dm.get_movie_by_id(1), dm.get_movie_by_id(2)
        expected = 0.7 * (1 / (2 + 1) / 2) + 0.3 * (b.average_rating / 5)
        assert similar_score(a, b) == pytest.approx(expected)

    def test_multiple_retrieval(self, dm):
        p = SimilarMovieProcess(dm)
        cands = p.multiple_retrieval_candidates(dm.get_movie_by_id(1))
        assert all(c.movie_id != 1 for c in cands)
        assert len(cands) == 5  # everything else in this tiny universe


class TestRecForYou:
    def test_emb_model(self, dm):
        p = RecForYouProcess(dm)
        out = p.get_rec_list(1, 3, "emb")
        # user 1 emb (1,0): movies 1 then 2 then 5 by cosine
        assert [m.movie_id for m in out][:2] == [1, 2]

    def test_unknown_user_empty(self, dm):
        assert RecForYouProcess(dm).get_rec_list(777, 5, "emb") == []

    def test_default_preserves_candidate_order(self, dm):
        p = RecForYouProcess(dm)
        out = p.get_rec_list(1, 6, "whatever")
        ratings_sorted = [m.movie_id for m in dm.get_movies(6, "rating")]
        assert [m.movie_id for m in out] == ratings_sorted

    def test_neuralcf_scorer_path(self, dm):
        import jax

        from sparrowrecsys_tpu.models import build_model

        model = build_model("neuralcf")
        feats = {
            "movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)
        }
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        scorer = ModelScorer(model, params, batch_pad=16)
        p = RecForYouProcess(dm, scorer)
        out = p.get_rec_list(1, 4, "nerualcf")  # the reference's typo spelling
        assert len(out) == 4


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, dm):
        from sparrowrecsys_tpu.config import ServingConfig
        from sparrowrecsys_tpu.serving.server import RecSysServer

        os.environ["PORT"] = "0"  # ephemeral
        s = RecSysServer(dm, ServingConfig(port=0))
        s.start()
        yield s
        s.stop()
        os.environ.pop("PORT", None)

    def _get(self, server, path):
        with urllib.request.urlopen(
            f"http://localhost:{server.port}{path}", timeout=10
        ) as r:
            body = r.read()
        return body

    def test_getmovie(self, server):
        out = json.loads(self._get(server, "/getmovie?id=1"))
        assert out["movieId"] == 1 and out["title"] == "Alpha"

    def test_getuser_wrapper_shape(self, server):
        out = json.loads(self._get(server, "/getuser?id=1"))
        assert out["ratings"][0]["rating"]["userId"] == 1

    def test_getrecommendation(self, server):
        out = json.loads(
            self._get(server, "/getrecommendation?genre=Action&size=2&sortby=rating")
        )
        assert [m["movieId"] for m in out] == [1, 2]

    def test_getsimilarmovie(self, server):
        out = json.loads(
            self._get(server, "/getsimilarmovie?movieId=1&size=2&model=emb")
        )
        assert out[0]["movieId"] == 2

    def test_getrecforyou(self, server):
        out = json.loads(self._get(server, "/getrecforyou?id=1&size=3&model=emb"))
        assert out[0]["movieId"] == 1

    def test_error_returns_empty(self, server):
        assert self._get(server, "/getmovie?id=notanint") == b""
        assert (
            self._get(server, "/getrecommendation?genre=Nope&size=5&sortby=rating")
            == b""
        )

    def test_static_webroot(self, server):
        body = self._get(server, "/index.html")
        assert b"SparrowRecSys" in body


class TestSidecar:
    def test_rest_round_trip(self, dm):
        import jax

        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.serving.rankers import RestScorer
        from sparrowrecsys_tpu.serving.sidecar import ScoringSidecar

        model = build_model("neuralcf")
        feats = {"movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)}
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        scorer = ModelScorer(model, params, batch_pad=16)
        sidecar = ScoringSidecar(scorer, port=0)
        sidecar.start()
        try:
            client = RestScorer(
                f"http://localhost:{sidecar.port}/v1/models/recmodel:predict"
            )
            scores = client.score(1, [1, 2, 3])
            direct = scorer.score(1, [1, 2, 3])
            np.testing.assert_allclose(scores, direct, rtol=1e-5)
        finally:
            sidecar.stop()

    def test_map_post_parity(self, dm):
        """asyncMapPostRequest parity (HttpClient.java:65-101): concurrent
        keyed POSTs, keyed responses; None on empty map."""
        import json

        import jax

        from sparrowrecsys_tpu.models import build_model
        from sparrowrecsys_tpu.serving.rankers import RestScorer
        from sparrowrecsys_tpu.serving.sidecar import ScoringSidecar

        model = build_model("neuralcf")
        feats = {"movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)}
        params = model.init(jax.random.PRNGKey(0), feats)["params"]
        scorer = ModelScorer(model, params, batch_pad=16)
        sidecar = ScoringSidecar(scorer, port=0)
        sidecar.start()
        try:
            client = RestScorer(
                f"http://localhost:{sidecar.port}/v1/models/recmodel:predict"
            )
            assert client.map_post({}) is None
            assert client.map_post(None) is None
            body = lambda u: json.dumps(
                {"instances": [{"userId": u, "movieId": 1}]}
            )
            out = client.map_post({"a": body(1), "b": body(2)})
            assert set(out) == {"a", "b"}
            for v in out.values():
                assert "predictions" in json.loads(v)
        finally:
            sidecar.stop()


class TestSecurityRegressions:
    """Regressions for the round-1 code-review findings."""

    def test_static_no_path_traversal(self, tmp_path, dm):
        import urllib.error

        from sparrowrecsys_tpu.config import ServingConfig
        from sparrowrecsys_tpu.serving.server import RecSysServer

        webroot = tmp_path / "webroot"
        webroot.mkdir()
        (webroot / "ok.html").write_text("fine")
        secret = tmp_path / "webroot_secret"
        secret.mkdir()
        (secret / "key.txt").write_text("SECRET")
        os.environ["PORT"] = "0"
        s = RecSysServer(dm, ServingConfig(port=0), webroot=str(webroot))
        s.start()
        try:
            import http.client

            conn = http.client.HTTPConnection("localhost", s.port, timeout=10)
            # Raw request path that normpath-resolves outside the webroot.
            conn.request("GET", "/../webroot_secret/key.txt")
            resp = conn.getresponse()
            body = resp.read()
            assert b"SECRET" not in body
            conn.close()
            with urllib.request.urlopen(
                f"http://localhost:{s.port}/ok.html", timeout=10
            ) as r:
                assert r.read() == b"fine"
        finally:
            s.stop()
            os.environ.pop("PORT", None)

    def test_relative_webroot_serves(self, dm, tmp_path, monkeypatch):
        from sparrowrecsys_tpu.config import ServingConfig
        from sparrowrecsys_tpu.serving.server import RecSysServer

        (tmp_path / "wr").mkdir()
        (tmp_path / "wr" / "index.html").write_text("rel ok")
        monkeypatch.chdir(tmp_path)
        os.environ["PORT"] = "0"
        s = RecSysServer(dm, ServingConfig(port=0), webroot="wr")
        s.start()
        try:
            with urllib.request.urlopen(
                f"http://localhost:{s.port}/index.html", timeout=10
            ) as r:
                assert r.read() == b"rel ok"
        finally:
            s.stop()
            os.environ.pop("PORT", None)


def test_recforyou_micro_batching(dm):
    """Concurrent /getrecforyou rankings through the micro-batcher match
    the unbatched path."""
    import threading

    plain = RecForYouProcess(dm)
    batched = RecForYouProcess(dm, micro_batch=True)
    expected = {u: [m.movie_id for m in plain.get_rec_list(u, 5, "emb")]
                for u in (1, 2, 3)}
    results = {}

    def worker(u):
        results[u] = [m.movie_id for m in batched.get_rec_list(u, 5, "emb")]

    threads = [
        threading.Thread(target=worker, args=(u,))
        for u in (1, 2, 3, 1, 2, 3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == expected


def test_sidecar_malformed_request_returns_400(dm):
    import http.client
    import jax

    from sparrowrecsys_tpu.models import build_model
    from sparrowrecsys_tpu.serving.sidecar import ScoringSidecar

    model = build_model("neuralcf")
    feats = {"movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)}
    params = model.init(jax.random.PRNGKey(0), feats)["params"]
    sc = ScoringSidecar(ModelScorer(model, params, batch_pad=8), port=0)
    sc.start()
    try:
        conn = http.client.HTTPConnection("localhost", sc.port, timeout=10)
        conn.request(
            "POST", "/v1/models/recmodel:predict",
            body=b'{"instances": [{"userId": "abc"}]}',
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"error" in resp.read()
        conn.close()
    finally:
        sc.stop()


def test_static_percent_encoded_paths(dm, tmp_path):
    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.server import RecSysServer

    webroot = tmp_path / "wr"
    webroot.mkdir()
    (webroot / "a b.txt").write_text("spaced")
    os.environ["PORT"] = "0"
    s = RecSysServer(dm, ServingConfig(port=0), webroot=str(webroot))
    s.start()
    try:
        with urllib.request.urlopen(
            f"http://localhost:{s.port}/a%20b.txt", timeout=10
        ) as r:
            assert r.read() == b"spaced"
    finally:
        s.stop()
        os.environ.pop("PORT", None)


def test_metrics_exposes_batcher_wave_stats(dm):
    """/metrics carries live dispatch-amortization stats for the emb-path
    cosine batcher (requests, waves, requests_per_wave) once ranked
    traffic has flowed."""
    import urllib.request

    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.server import RecSysServer

    os.environ["PORT"] = "0"
    s = RecSysServer(dm, ServingConfig(port=0))
    s.start()
    try:
        base = f"http://localhost:{s.port}"
        uid = int(dm.user_emb_ids[0]) if len(dm.user_emb_ids) else 1
        urllib.request.urlopen(
            f"{base}/getrecforyou?id={uid}&size=4&model=emb", timeout=30
        ).read()
        snap = json.loads(
            urllib.request.urlopen(f"{base}/metrics", timeout=10).read()
        )
    finally:
        s.stop()
        os.environ.pop("PORT", None)
    emb = snap["batchers"]["emb"]
    assert emb["waves"] >= 1 and emb["requests"] >= 1
    assert emb["requests_per_wave"] >= 1


def test_poster_svg_served_at_reference_jpg_path(dm):
    """The reference vendors posters/<movieId>.jpg (SURVEY.md §2.5); the
    rebuild serves a deterministic catalog-rendered SVG at the same URL
    surface (binary-free), 404 for unknown ids, and a real on-disk file
    still wins."""
    import urllib.error
    import urllib.request

    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.server import RecSysServer

    os.environ["PORT"] = "0"
    s = RecSysServer(dm, ServingConfig(port=0))
    s.start()
    try:
        base = f"http://localhost:{s.port}"
        with urllib.request.urlopen(f"{base}/posters/1.jpg", timeout=10) as r:
            assert r.headers["Content-Type"] == "image/svg+xml"
            body = r.read().decode()
        m = dm.get_movie_by_id(1)
        assert "<svg" in body and m.title[:24] in body
        try:
            urllib.request.urlopen(f"{base}/posters/999999.jpg", timeout=10)
            raise AssertionError("unknown movie id should 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        s.stop()
        os.environ.pop("PORT", None)
