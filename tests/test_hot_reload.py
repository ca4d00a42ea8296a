"""Hot model-version reload — TF Serving version-policy parity.

The reference's serving sidecar (TF Serving) polls the versioned
SavedModel dirs (`webroot/modeldata/neuralcf/001-002`, export at
`NeuralCF.py:106-114`) and atomically serves the newest version while
running (`RecForYouProcess.java:139` relies on it). These tests drive the
rebuild's equivalent: `ModelScorer.reload_if_new` + `ModelVersionWatcher`
wired into `RecSysServer` (mid-serving swap, /metrics visibility, zero
5xx) and `ScoringSidecar`.
"""

import json
import time
import urllib.request

import jax
import numpy as np
import pytest

from sparrowrecsys_tpu.models import build_model
from sparrowrecsys_tpu.serving.catalog import DataManager
from sparrowrecsys_tpu.serving.rankers import ModelScorer, ModelVersionWatcher
from sparrowrecsys_tpu.training import checkpoint


@pytest.fixture(scope="module")
def dm(tmp_path_factory):
    """Tiny catalog (same universe as tests/test_serving.py)."""
    root = tmp_path_factory.mktemp("hotreload")
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
    return DataManager().load_data(str(movies), None, str(ratings), str(memb), None)


def _neuralcf_params(seed: int):
    model = build_model("neuralcf")
    feats = {"movieId": np.zeros(2, np.int32), "userId": np.zeros(2, np.int32)}
    return model, model.init(jax.random.PRNGKey(seed), feats)["params"]


def test_reload_if_new_swaps_params(tmp_path):
    model, p1 = _neuralcf_params(0)
    _, p2 = _neuralcf_params(1)
    mdir = str(tmp_path / "neuralcf")
    checkpoint.save(p1, mdir)  # 001

    scorer = ModelScorer.from_checkpoint(model, mdir, batch_pad=8)
    assert scorer.version == 1
    before = scorer.score(1, [1, 2, 3, 4])

    assert scorer.reload_if_new() is None  # already current

    checkpoint.save(p2, mdir)  # 002
    assert scorer.reload_if_new() == 2
    assert scorer.version == 2
    after = scorer.score(1, [1, 2, 3, 4])
    assert not np.allclose(before, after)  # different params -> new scores
    assert scorer.reload_if_new() is None


def test_incomplete_export_never_served(tmp_path):
    """A half-written NNN/ dir (params without meta.json — save() writes
    meta last) must not be picked up; completing it makes it eligible."""
    model, p1 = _neuralcf_params(0)
    mdir = str(tmp_path / "m")
    checkpoint.save(p1, mdir)  # 001 complete
    scorer = ModelScorer.from_checkpoint(model, mdir, batch_pad=8)

    vdir = tmp_path / "m" / "002"
    vdir.mkdir()
    (vdir / "params.msgpack").write_bytes(
        (tmp_path / "m" / "001" / "params.msgpack").read_bytes()
    )
    assert checkpoint.latest_ready_version(mdir) == 1
    assert scorer.reload_if_new() is None
    assert scorer.version == 1

    (vdir / "meta.json").write_text("{}")
    assert checkpoint.latest_ready_version(mdir) == 2
    assert scorer.reload_if_new() == 2


def test_watcher_poll_once_reports_swaps(tmp_path):
    model, p1 = _neuralcf_params(0)
    _, p2 = _neuralcf_params(1)
    mdir = str(tmp_path / "w")
    checkpoint.save(p1, mdir)
    scorer = ModelScorer.from_checkpoint(model, mdir, batch_pad=8)
    watcher = ModelVersionWatcher({"neuralcf": scorer}, poll_s=0.01)
    assert watcher.poll_once() == {}
    assert watcher.versions() == {"neuralcf": 1}
    checkpoint.save(p2, mdir)
    assert watcher.poll_once() == {"neuralcf": 2}
    assert watcher.versions() == {"neuralcf": 2}


def test_server_hot_reload_mid_serving(dm, tmp_path):
    """VERDICT r3 #2 acceptance: start the server, export v002 while
    serving, scores change, /metrics shows the version, zero 5xx."""
    import dataclasses

    from sparrowrecsys_tpu.config import ServingConfig
    from sparrowrecsys_tpu.serving.server import RecSysServer

    model, p1 = _neuralcf_params(0)
    _, p2 = _neuralcf_params(1)
    mdir = str(tmp_path / "served")
    checkpoint.save(p1, mdir)
    scorer = ModelScorer.from_checkpoint(model, mdir, batch_pad=8)

    cfg = ServingConfig(port=0, model_poll_s=0.05)
    server = RecSysServer(dm, cfg, scorer=scorer)
    server.start()
    statuses = []

    def get(path):
        with urllib.request.urlopen(
            f"http://localhost:{server.port}{path}", timeout=10
        ) as r:
            statuses.append(r.status)
            return r.read()

    try:
        rank_path = "/getrecforyou?id=1&size=6&model=neuralcf"
        before = get(rank_path)
        assert before  # ranked list served from v001
        m = json.loads(get("/metrics"))
        assert m["model_versions"] == {"neuralcf": 1}

        checkpoint.save(p2, mdir)  # export v002 mid-serving
        deadline = time.time() + 10
        while scorer.version != 2 and time.time() < deadline:
            get(rank_path)  # keep traffic flowing during the swap
            time.sleep(0.02)
        assert scorer.version == 2  # watcher picked it up without restart

        # Scores changed: fresh params re-rank the candidate list.
        after_scores = scorer.score(1, [1, 2, 3, 4, 5, 6])
        p1_scorer = ModelScorer(model, p1, batch_pad=8)
        assert not np.allclose(p1_scorer.score(1, [1, 2, 3, 4, 5, 6]), after_scores)

        m = json.loads(get("/metrics"))
        assert m["model_versions"] == {"neuralcf": 2}
        # >= 1: the registry is process-global, earlier tests also reload.
        assert m["counters"].get("model.reload.neuralcf", 0) >= 1
        assert all(s == 200 for s in statuses)  # zero 5xx throughout
    finally:
        server.stop()


def test_sidecar_hot_reload(tmp_path):
    """Same behavior on the TF-Serving-protocol sidecar."""
    from sparrowrecsys_tpu.serving.rankers import RestScorer
    from sparrowrecsys_tpu.serving.sidecar import ScoringSidecar

    model, p1 = _neuralcf_params(0)
    _, p2 = _neuralcf_params(1)
    mdir = str(tmp_path / "sc")
    checkpoint.save(p1, mdir)
    scorer = ModelScorer.from_checkpoint(model, mdir, batch_pad=8)
    sc = ScoringSidecar(scorer, port=0, poll_s=0.05)
    sc.start()
    try:
        client = RestScorer(f"http://localhost:{sc.port}/v1/models/recmodel:predict")
        before = client.score(1, [1, 2, 3])
        checkpoint.save(p2, mdir)
        deadline = time.time() + 10
        while scorer.version != 2 and time.time() < deadline:
            time.sleep(0.02)
        assert scorer.version == 2
        after = client.score(1, [1, 2, 3])
        assert not np.allclose(before, after)
    finally:
        sc.stop()
