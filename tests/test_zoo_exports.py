"""Every zoo model has a versioned export that loads and ranks online.

Reference-asset parity (SURVEY.md §2.6): the reference ships versioned
SavedModel dirs for its serving models (`webroot/modeldata/MLPRec/001-005/`,
`webroot/modeldata/neuralcf/001-002/`). `tools/export_zoo.py` produces the
analogous `data/modeldata/<model>/NNN/` tree for all 8 zoo models; these
tests assert (a) the dirs exist with the expected version layout, and
(b) each export restores through `ModelScorer.from_checkpoint` and ranks
the top candidates through the full-feature assembler — the exact
`--rank-model` serving path (serving/server.py main()).
"""

import os

import numpy as np
import pytest

from sparrowrecsys_tpu.models import MODEL_REGISTRY, build_model
from sparrowrecsys_tpu.serving.assembler import FeatureAssembler
from sparrowrecsys_tpu.serving.catalog import DataManager
from sparrowrecsys_tpu.serving.feature_store import FeatureStore
from sparrowrecsys_tpu.serving.rankers import ModelScorer

DATA = "data"
MODELDATA = os.path.join(DATA, "modeldata")


@pytest.fixture(scope="module")
def world():
    dm = DataManager().load_data(
        f"{DATA}/movies.csv", f"{DATA}/links.csv", f"{DATA}/ratings.csv",
        f"{MODELDATA}/item2vecEmb.csv", f"{MODELDATA}/userEmb.csv",
    )
    store = FeatureStore.load(f"{DATA}/feature_store.json")
    return dm, FeatureAssembler(store, dm)


def test_all_zoo_models_have_versioned_exports():
    for name in MODEL_REGISTRY:
        mdir = os.path.join(MODELDATA, name)
        assert os.path.isdir(mdir), f"missing export dir for {name}"
        versions = [d for d in os.listdir(mdir) if d.isdigit()]
        assert versions, f"no NNN/ versions under {mdir}"
        for v in versions:
            assert os.path.exists(os.path.join(mdir, v, "params.msgpack"))
            assert os.path.exists(os.path.join(mdir, v, "meta.json"))


def test_embedding_mlp_ships_five_versions_like_mlprec():
    """MLPRec/001-005 layout parity: a real 5-epoch chain."""
    versions = sorted(os.listdir(os.path.join(MODELDATA, "embedding_mlp")))
    assert versions == ["001", "002", "003", "004", "005"]


def test_dien_chain_exercised_keep_pruning():
    """6 snapshots exported with keep=5 -> version 001 pruned on disk."""
    versions = sorted(os.listdir(os.path.join(MODELDATA, "dien")))
    assert versions == ["002", "003", "004", "005", "006"]


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_every_export_loads_and_ranks_online(name, world):
    """The --rank-model path: restore the newest version, assemble the
    27-feature rows online, rank real candidates."""
    dm, asm = world
    extra = ()
    if name == "dien":
        from sparrowrecsys_tpu.models.dien import NEGATIVE_COLS

        extra = tuple(NEGATIVE_COLS)
    scorer = ModelScorer.from_checkpoint(
        build_model(name), os.path.join(MODELDATA, name),
        batch_pad=32, assembler=asm, extra_int_cols=extra,
    )
    assert scorer.version is not None
    user = next(iter(dm.users))
    cand_ids = [m.movie_id for m in dm.get_movies(20, "rating")]
    scores = scorer.score(user, cand_ids)
    assert scores.shape == (20,)
    assert np.all(np.isfinite(scores))
    assert np.all((scores >= 0) & (scores <= 1))  # sigmoid outputs
    # A trained model must discriminate: not all candidates tie.
    assert np.std(scores) > 0
