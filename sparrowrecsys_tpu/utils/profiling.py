"""Profiling and tracing.

The reference's observability is `System.out.println` progress lines
(SURVEY.md §5) — here the aux subsystem is real: `trace()` wraps
`jax.profiler` (open the dump with XProf/TensorBoard to see HLO-level
timing), and `StepTimer` gives EMA-smoothed per-step wall times +
examples/sec without device syncs on the hot path (it reads the host
clock only; call `mark_sync()` at epoch ends for exact numbers).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sparrow_trace") -> Iterator[None]:
    """`with trace(): step()` — captures a jax.profiler trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA per-step timing. Steps are dispatched async; per-step host deltas
    measure dispatch pace, `mark_sync(x)` blocks on `x` for a true reading."""

    def __init__(self, batch_size: int, ema: float = 0.98):
        self.batch_size = batch_size
        self.ema = ema
        self.step_time: Optional[float] = None
        self._last: Optional[float] = None
        self.steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt
                if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        self.steps += 1

    def mark_sync(self, x) -> None:
        # block_until_ready returns early on the axon remote backend
        # (CLAUDE.md); hard_sync forces a device->host read, which cannot
        # complete before the producing executable does.
        from sparrowrecsys_tpu.training.loop import hard_sync

        hard_sync(x)
        self._last = time.perf_counter()

    @property
    def examples_per_sec(self) -> float:
        if not self.step_time:
            return 0.0
        return self.batch_size / self.step_time
