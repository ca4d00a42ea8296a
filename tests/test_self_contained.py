"""The repo must run without the read-only reference mount (VERDICT r1 #3).

Two guarantees: (a) no load-bearing `/root/reference` path anywhere in the
package, bench, tools, or tests; (b) the serving plane boots end-to-end
from vendored `data/` assets alone (movies.csv + links.csv now live in the
repo, replacing the round-1 fallback to the reference sampledata dir).
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_reference_paths_in_code():
    offenders = []
    roots = ["sparrowrecsys_tpu", "tools", "tests", "bench.py", "__graft_entry__.py"]
    for root in roots:
        path = os.path.join(REPO, root)
        files = []
        if os.path.isfile(path):
            files = [path]
        else:
            for dirpath, _, names in os.walk(path):
                files += [
                    os.path.join(dirpath, n)
                    for n in names
                    if n.endswith((".py", ".cc", ".h", ".sh"))
                ]
        # reference_anchor.py EXISTS to execute the reference's TF scripts
        # (parity anchoring); it is not load-bearing for the framework —
        # it degrades to a no-op when the mount is absent.
        exempt = {os.path.abspath(__file__),
                  os.path.join(REPO, "tools", "reference_anchor.py")}
        for f in files:
            if os.path.abspath(f) in exempt:
                continue
            with open(f, encoding="utf-8") as fh:
                for i, line in enumerate(fh, 1):
                    if "/root/reference" in line and not re.search(
                        r"(#|\"\"\"|''').*?/root/reference", line
                    ):
                        # allow doc/comment citations; flag string literals
                        if re.search(r"['\"]/root/reference", line):
                            offenders.append(f"{f}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


def test_vendored_assets_present():
    for name in ("movies.csv", "links.csv", "ratings.csv", "goldenTestSamples.csv"):
        assert os.path.exists(os.path.join(REPO, "data", name)), name


def test_serving_boots_from_repo_data_only():
    from sparrowrecsys_tpu.serving.catalog import DataManager

    data = os.path.join(REPO, "data")
    dm = DataManager().load_data(
        os.path.join(data, "movies.csv"),
        os.path.join(data, "links.csv"),
        os.path.join(data, "ratings.csv"),
        os.path.join(data, "modeldata", "item2vecEmb.csv"),
        os.path.join(data, "modeldata", "userEmb.csv"),
    )
    m = dm.get_movie_by_id(1)
    assert m is not None and m.title
    # links joined: imdbId/tmdbId populated for movie 1 (Toy Story)
    assert m.imdb_id and m.tmdb_id
    assert dm.get_movies(10, "rating")
