"""Micro-batcher tests."""

import threading
import time

import numpy as np
import pytest

from sparrowrecsys_tpu.serving.batcher import MicroBatcher


def test_single_query_round_trip():
    calls = []

    def scorer(batch):
        calls.append(batch.shape[0])
        return batch * 2.0

    b = MicroBatcher(scorer, max_batch=8, max_wait_ms=5)
    out = b.submit(np.array([1.0, 2.0]))
    np.testing.assert_allclose(out, [2.0, 4.0])
    assert calls == [8]  # static batch: padded to max_batch


def test_concurrent_queries_batched():
    calls = []
    lock = threading.Lock()

    def scorer(batch):
        with lock:
            calls.append(batch.shape[0])
        time.sleep(0.01)
        return batch + 100.0

    b = MicroBatcher(scorer, max_batch=64, max_wait_ms=30)
    results = {}

    def worker(i):
        results[i] = b.submit(np.array([float(i)]))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(16):
        np.testing.assert_allclose(results[i], [100.0 + i])
    # Far fewer scorer calls than queries (batching happened), and every
    # call is the static max_batch size.
    assert len(calls) <= 4 and all(c == 64 for c in calls), calls


def test_error_propagates_to_waiters():
    def scorer(batch):
        raise RuntimeError("boom")

    b = MicroBatcher(scorer, max_batch=4, max_wait_ms=1)
    with pytest.raises(RuntimeError):
        b.submit(np.zeros(3))
    # Batcher still usable after the error.
    b.scorer = lambda x: x
    np.testing.assert_allclose(b.submit(np.ones(3)), np.ones(3))


def test_overflow_drains_in_multiple_batches():
    sizes = []

    def scorer(batch):
        sizes.append(batch.shape[0])
        return batch

    b = MicroBatcher(scorer, max_batch=4, max_wait_ms=20)
    threads = [
        threading.Thread(target=lambda i=i: b.submit(np.array([float(i)])))
        for i in range(10)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # Under load the 10 submissions can straddle batching windows, so the
    # exact call count is timing-dependent; the invariants are: every
    # scorer call is padded to max_batch, at least one batch coalesced
    # multiple requests, and nothing is left pending.
    assert 3 <= len(sizes) <= 10
    assert all(c == 4 for c in sizes)
    assert b.stats()["pending"] == 0
