"""Micro-batching for on-device scoring — SURVEY.md §7 hard-part #7.

Serving queries arrive one at a time, but the device wants batches: a
single [1, D] cosine or CTR forward wastes a whole dispatch (10-100 ms of
round-trip on remote-attached devices, ~10 us of compute). The
MicroBatcher collects concurrent requests for up to `max_wait_ms` (or
until `max_batch` accumulate), runs ONE batched scoring call, and fans the
rows back out to the waiting callers.

Used in front of any row-wise scorer: `ModelScorer.score`-style callables
or the cosine ranker. Shapes stay static by padding to `max_batch`, so one
compiled executable serves every traffic level.
"""

from __future__ import annotations

import threading
from typing import Callable, List, Sequence, Tuple

import numpy as np


class MicroBatcher:
    """Batches concurrent `submit(query_row)` calls into one scorer call.

    scorer: Callable[[np.ndarray [B, ...]], np.ndarray [B, ...]] — must
    accept a stacked batch of query rows and return one result row per
    query (padding rows included; they are dropped on fan-out).
    """

    def __init__(
        self,
        scorer: Callable[[np.ndarray], np.ndarray],
        max_batch: int = 256,
        max_wait_ms: float = 2.0,
    ):
        self.scorer = scorer
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._lock = threading.Lock()
        self._pending: List[Tuple[np.ndarray, threading.Event, dict]] = []
        self._leader_running = False

    def submit(self, query: np.ndarray) -> np.ndarray:
        """Block until this query's row is scored; thread-safe."""
        ev = threading.Event()
        slot: dict = {}
        with self._lock:
            self._pending.append((np.asarray(query), ev, slot))
            become_leader = not self._leader_running
            if become_leader:
                self._leader_running = True
        if become_leader:
            self._drive()
        ev.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _drive(self) -> None:
        """Leader thread: wait the micro-window, then score the batch."""
        import time

        deadline = time.perf_counter() + self.max_wait
        while time.perf_counter() < deadline:
            with self._lock:
                if len(self._pending) >= self.max_batch:
                    break
            time.sleep(self.max_wait / 10)
        with self._lock:
            batch = self._pending[: self.max_batch]
            self._pending = self._pending[self.max_batch :]
            # A follower becomes the next leader if work remains.
            if self._pending:
                next_leader = True
            else:
                next_leader = False
                self._leader_running = False
        try:
            queries = np.stack([q for q, _, _ in batch])
            results = self.scorer(queries)
            for i, (_, ev, slot) in enumerate(batch):
                slot["result"] = np.asarray(results[i])
                ev.set()
        except Exception as e:  # propagate to every waiter
            for _, ev, slot in batch:
                slot["error"] = e
                ev.set()
        if next_leader:
            self._drive()

    def stats(self) -> dict:
        with self._lock:
            return {"pending": len(self._pending)}
