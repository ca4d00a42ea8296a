"""CLI entry-point tests: drive the offline job mains in-process on a
tiny tmp data root (CPU backend via conftest)."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture
def tiny_root(tmp_path):
    """Minimal movies/ratings CSVs that survive the userRatingCount>1
    filter and produce positive sequences for item2vec."""
    movies = tmp_path / "movies.csv"
    rows = ["movieId,title,genres"]
    for i in range(1, 21):
        rows.append(f"{i},Film {i} ({1990 + i}),Action|Drama")
    movies.write_text("\n".join(rows) + "\n")
    ratings = tmp_path / "ratings.csv"
    rng = np.random.default_rng(0)
    lines = ["userId,movieId,rating,timestamp"]
    for u in range(1, 31):
        for k, m in enumerate(rng.choice(np.arange(1, 21), 8, replace=False)):
            lines.append(f"{u},{m},{3.0 + (k % 3)},{1000 + k}")
    ratings.write_text("\n".join(lines) + "\n")
    return str(tmp_path)


def run_main(module, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_featureeng_cli(tiny_root, capsys):
    import sparrowrecsys_tpu.data.run as m

    run_main(m, ["run", "--data-root", tiny_root, "--export-features"])
    out = capsys.readouterr().out
    assert "wrote" in out
    assert os.path.exists(os.path.join(tiny_root, "trainingSamples.csv"))
    assert os.path.exists(os.path.join(tiny_root, "feature_store.json"))


def test_embedding_cli(tiny_root, capsys):
    import sparrowrecsys_tpu.embedding.run as m

    run_main(
        m, ["run", "--data-root", tiny_root, "--epochs", "2", "--user-emb"]
    )
    out = capsys.readouterr().out
    assert "item2vec:" in out and "userEmb:" in out
    assert os.path.exists(os.path.join(tiny_root, "modeldata", "item2vecEmb.csv"))
    assert os.path.exists(os.path.join(tiny_root, "modeldata", "userEmb.csv"))


def test_training_cli(tiny_root, capsys, tmp_path):
    # First generate samples in the tiny root.
    import sparrowrecsys_tpu.data.run as gen

    run_main(gen, ["run", "--data-root", tiny_root])
    import sparrowrecsys_tpu.training.run as m

    export = str(tmp_path / "ckpt")
    run_main(
        m,
        ["run", "--data-root", tiny_root, "--model", "neuralcf",
         "--epochs", "1", "--batch-size", "64", "--export", export],
    )
    out = capsys.readouterr().out
    assert "test:" in out and "Predicted good rating" in out
    assert os.path.isdir(os.path.join(export, "001"))


def test_als_cli(tiny_root, capsys):
    import sparrowrecsys_tpu.models.als as m

    run_main(m, ["als", "--data-root", tiny_root])
    out = capsys.readouterr().out
    assert "Root-mean-square error" in out


def test_transforms_cli(tiny_root, capsys):
    import sparrowrecsys_tpu.data.transforms as m

    run_main(m, ["transforms", "--data-root", tiny_root])
    out = capsys.readouterr().out
    assert "one-hot sample" in out and "countBucket" in out


def test_training_cli_config_file(tiny_root, tmp_path, capsys):
    import json

    import sparrowrecsys_tpu.data.run as gen

    run_main(gen, ["run", "--data-root", tiny_root])
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump({"data": {"data_root": tiny_root}, "train": {"batch_size": 64}}, f)
    import sparrowrecsys_tpu.training.run as m

    run_main(m, ["run", "--config", cfg_path, "--model", "neuralcf", "--epochs", "1"])
    out = capsys.readouterr().out
    assert "test:" in out
