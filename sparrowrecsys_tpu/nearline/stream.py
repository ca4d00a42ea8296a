"""Streaming latest-behaviour feature — the Flink `RealTimeFeature` rebuild.

Reference (`nearline/flink/RealTimeFeature.java:42-73`): file-watch source
over ratings.csv re-read every 100 ms (`PROCESS_CONTINUOUSLY`), map line ->
Rating, `keyBy(userId).timeWindow(1s).reduce(max-by-timestamp)`, sink
prints `userId / latestMovieId`. The reference only demonstrates the
pattern — it never writes the feature anywhere.

This rebuild completes the loop (SURVEY.md §7 step 7): the windowed
latest-event reduce feeds a callback, and `attach_to_store` wires it into
the serving plane's user features (the `uf:<id>` role Redis plays in the
reference) so `/getrecforyou` sees fresh behaviour.

Design: a polling tail source (new rows only, unlike the reference's full
re-read — divergence documented: re-reading replays all events every 100ms,
which is plainly an artifact of `PROCESS_CONTINUOUSLY`) and a pure-Python
keyed tumbling window. Throughput here is IO-bound, not compute — no
device work to offload.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Callable, Dict, List, Optional


@dataclasses.dataclass
class RatingEvent:
    user_id: int
    movie_id: int
    rating: float
    timestamp: int


class FileWatchSource:
    """Tail a ratings CSV: emits newly appended rows every `interval` s."""

    def __init__(self, path: str, interval: float = 0.1, from_start: bool = False):
        self.path = path
        self.interval = interval
        self._offset = 0 if from_start else None
        self._stop = threading.Event()

    def poll(self) -> List[RatingEvent]:
        if not os.path.exists(self.path):
            return []
        events: List[RatingEvent] = []
        # Binary mode: offsets are byte-exact. Text mode's universal-newline
        # translation makes len(line) undercount CRLF files by one byte per
        # row, desynchronizing the tail offset into mid-line garbage.
        with open(self.path, "rb") as f:
            if self._offset is None:  # first poll: skip existing content
                f.seek(0, os.SEEK_END)
                self._offset = f.tell()
                return []
            f.seek(0, os.SEEK_END)
            size = f.tell()
            if size < self._offset:
                # Truncation/rotation: restart from the top of the new file.
                self._offset = 0
            f.seek(self._offset)
            for raw in f:
                if not raw.endswith(b"\n"):
                    break  # partial write; re-read next poll
                self._offset += len(raw)
                parts = raw.decode("utf-8", "replace").strip().split(",")
                if len(parts) < 4 or parts[0] == "userId":
                    continue
                try:
                    events.append(
                        RatingEvent(
                            int(parts[0]), int(parts[1]),
                            float(parts[2]), int(parts[3]),
                        )
                    )
                except ValueError:
                    continue  # ignore_errors parity
        return events


class LatestRatingStream:
    """keyBy(userId) + tumbling window + max-by-timestamp reduce."""

    def __init__(
        self,
        source: FileWatchSource,
        window_seconds: float = 1.0,   # timeWindow(Time.seconds(1))
        sink: Optional[Callable[[RatingEvent], None]] = None,
    ):
        self.source = source
        self.window_seconds = window_seconds
        self.sink = sink or (lambda e: print(f"user:{e.user_id}\tlatest movie:{e.movie_id}"))
        self.latest: Dict[int, RatingEvent] = {}
        self._pending: Dict[int, RatingEvent] = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _reduce(self, events: List[RatingEvent]) -> None:
        for e in events:
            cur = self._pending.get(e.user_id)
            # reduce: keep the rating with the larger timestamp
            if cur is None or e.timestamp > cur.timestamp:
                self._pending[e.user_id] = e

    def _fire_window(self) -> None:
        for uid, e in self._pending.items():
            self.latest[uid] = e
            self.sink(e)
        self._pending = {}

    def run_for(self, seconds: float) -> None:
        """Synchronous drive (used by tests): poll + window for a duration."""
        deadline = time.time() + seconds
        next_fire = time.time() + self.window_seconds
        while time.time() < deadline:
            self._reduce(self.source.poll())
            if time.time() >= next_fire:
                self._fire_window()
                next_fire += self.window_seconds
            time.sleep(self.source.interval)
        self._fire_window()

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        next_fire = time.time() + self.window_seconds
        while not self._stop.is_set():
            self._reduce(self.source.poll())
            if time.time() >= next_fire:
                self._fire_window()
                next_fire += self.window_seconds
            time.sleep(self.source.interval)

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)


def main() -> None:
    """`RealTimeFeature.main` parity (RealTimeFeature.java:79-81): watch a
    ratings CSV and print per-user latest-movie features per 1s window.

        python -m sparrowrecsys_tpu.nearline.stream [--ratings PATH]
            [--from-start] [--duration SECONDS]
    """
    import argparse

    from sparrowrecsys_tpu.config import DataConfig

    ap = argparse.ArgumentParser()
    ap.add_argument("--ratings", default=None)
    ap.add_argument("--from-start", action="store_true",
                    help="replay existing rows (the reference re-reads the "
                    "whole file; default here is tail-only)")
    ap.add_argument("--duration", type=float, default=30.0)
    args = ap.parse_args()
    path = args.ratings or DataConfig().path("ratings.csv")
    stream = LatestRatingStream(
        FileWatchSource(path, interval=0.1, from_start=args.from_start)
    )
    print(f"watching {path} for {args.duration}s ...")
    stream.run_for(args.duration)


def attach_to_store(stream: LatestRatingStream, dm) -> None:
    """Wire the stream into the serving catalog: update the user's
    `user_features['latestMovieId']` — the Redis `uf:<id>` hash role."""
    base_sink = stream.sink

    def sink(e: RatingEvent) -> None:
        user = dm.get_user_by_id(e.user_id)
        if user is None:
            # First-seen user: create the entity like DataManager's rating
            # loader does, so the streamed feature is not dropped.
            from sparrowrecsys_tpu.serving.catalog import User

            user = User(e.user_id)
            dm.users[e.user_id] = user
        if user.user_features is None:
            user.user_features = {}
        user.user_features["latestMovieId"] = str(e.movie_id)
        # The rating rides along so the online feature assembler can apply
        # the positive-only history rule (serving/assembler.py).
        user.user_features["latestMovieRating"] = str(e.rating)
        base_sink(e)

    stream.sink = sink


if __name__ == "__main__":
    main()
