"""Nearline streaming tests."""

import time

import pytest

from sparrowrecsys_tpu.nearline.stream import (
    FileWatchSource,
    LatestRatingStream,
    RatingEvent,
    attach_to_store,
)


def test_tail_source_emits_only_new_rows(tmp_path):
    path = tmp_path / "ratings.csv"
    path.write_text("userId,movieId,rating,timestamp\n1,10,4.0,100\n")
    src = FileWatchSource(str(path), interval=0.01)
    assert src.poll() == []  # existing content skipped
    with open(path, "a") as f:
        f.write("2,20,3.0,200\nbad,row\n3,30,5.0,300\n")
    events = src.poll()
    assert [(e.user_id, e.movie_id) for e in events] == [(2, 20), (3, 30)]
    assert src.poll() == []


def test_from_start_replays_existing(tmp_path):
    path = tmp_path / "ratings.csv"
    path.write_text("userId,movieId,rating,timestamp\n1,10,4.0,100\n")
    src = FileWatchSource(str(path), interval=0.01, from_start=True)
    events = src.poll()
    assert [(e.user_id, e.movie_id) for e in events] == [(1, 10)]


def test_window_keeps_latest_per_user(tmp_path):
    path = tmp_path / "ratings.csv"
    path.write_text("userId,movieId,rating,timestamp\n")
    out = []
    stream = LatestRatingStream(
        FileWatchSource(str(path), interval=0.01, from_start=True),
        window_seconds=0.1,
        sink=out.append,
    )
    with open(path, "a") as f:
        f.write("1,10,4.0,100\n1,11,3.0,300\n1,12,5.0,200\n2,20,2.0,50\n")
    stream.run_for(0.8)  # generous margin: suite runs under CPU contention
    latest = {e.user_id: e.movie_id for e in out}
    assert latest == {1: 11, 2: 20}  # max-by-timestamp per user


def test_attach_to_store_updates_user_features(tmp_path):
    from sparrowrecsys_tpu.serving.catalog import DataManager, User

    dm = DataManager()
    dm.users[7] = User(7)
    path = tmp_path / "ratings.csv"
    path.write_text("")
    stream = LatestRatingStream(
        FileWatchSource(str(path), interval=0.01, from_start=True),
        window_seconds=0.1,
        sink=lambda e: None,
    )
    attach_to_store(stream, dm)
    with open(path, "a") as f:
        f.write("7,42,5.0,999\n")
    stream.run_for(0.6)  # generous margin for loaded CI hosts
    assert dm.users[7].user_features["latestMovieId"] == "42"


def test_crlf_file_offsets_stay_exact(tmp_path):
    """Review regression: CRLF line endings must not desync the tail."""
    path = tmp_path / "ratings.csv"
    path.write_bytes(b"userId,movieId,rating,timestamp\r\n")
    src = FileWatchSource(str(path), interval=0.01)
    assert src.poll() == []
    with open(path, "ab") as f:
        for i in range(1, 21):
            f.write(f"{i},{i*10},4.0,{i*100}\r\n".encode())
    events = src.poll()
    assert [(e.user_id, e.movie_id) for e in events] == [
        (i, i * 10) for i in range(1, 21)
    ]
    assert src.poll() == []  # no phantom re-reads


def test_truncation_resets_offset(tmp_path):
    """Review regression: file rotation/truncation restarts the tail."""
    path = tmp_path / "ratings.csv"
    path.write_text("userId,movieId,rating,timestamp\n1,10,4.0,100\n")
    src = FileWatchSource(str(path), interval=0.01)
    assert src.poll() == []
    # Rotate: new, smaller file.
    path.write_text("2,20,3.0,200\n")
    events = src.poll()
    assert [(e.user_id, e.movie_id) for e in events] == [(2, 20)]


def test_attach_creates_first_seen_users(tmp_path):
    from sparrowrecsys_tpu.serving.catalog import DataManager

    dm = DataManager()  # no users loaded
    path = tmp_path / "r.csv"
    path.write_text("")
    stream = LatestRatingStream(
        FileWatchSource(str(path), interval=0.01, from_start=True),
        window_seconds=0.1, sink=lambda e: None,
    )
    attach_to_store(stream, dm)
    with open(path, "a") as f:
        f.write("99,7,5.0,1\n")
    stream.run_for(0.5)
    assert dm.users[99].user_features["latestMovieId"] == "7"
