"""Backpressure / refill watermarks for the claim loop.

Reference: the "Refill" goroutine + inactivity watchdog
(/root/reference/cmd/thecrowler/main.go:566-715):

- ``targetCap`` = the source channel capacity (here: parallel crawl
  slots); ``lowWater = targetCap / 2``, ``highWater = targetCap``;
- refill ONLY when a worker is available AND the queue dropped below
  the low watermark; then claim ``highWater − queued`` sources
  (main.go:655-658) — bursts are smoothed, the claim query never runs
  hot in a tight loop;
- any successful refill records activity; no new sources within
  ``inactivity_timeout`` (default 60 s) while nothing is running →
  the pipeline closes (main.go:620-636 + the 5-minute watchdog).

Spark rendering: the controller is pure driver-side control flow (no
data plane) — it decides the ``limit`` passed to
:func:`..operators.frontier.claim_sources` on each
:func:`.trigger.crawl_trigger_stream` tick. Pure logic, injectable
clock, so the watermark behavior is unit-testable without Spark.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass
class RefillPolicy:
    """Watermark knobs (main.go:570-578 defaults)."""

    capacity: int
    low_water: int | None = None  # default capacity // 2
    high_water: int | None = None  # default capacity (never exceed cap)
    inactivity_timeout_s: float = 60.0

    def __post_init__(self) -> None:
        if self.low_water is None:
            self.low_water = self.capacity // 2
        if self.high_water is None:
            self.high_water = self.capacity


class RefillController:
    """Decides per-tick claim sizes and pipeline-close, watermark-style."""

    def __init__(self, policy: RefillPolicy, clock=time.monotonic) -> None:
        self.policy = policy
        self._clock = clock
        self._last_activity = clock()
        self.closed = False

    def need(self, queued: int, available_workers: int) -> int:
        """How many sources to claim this tick.

        main.go:655-658: refill iff a worker is free AND the queue is
        below the low watermark; claim up to the high watermark.
        Busy / above-low states claim nothing (backpressure).
        """
        if self.closed:
            return 0
        p = self.policy
        if available_workers > 0 and queued < p.low_water:
            return max(p.high_water - queued, 0)
        return 0

    def record_activity(self, n_new: int) -> None:
        """A refill that returned sources resets the inactivity timer
        (``LastActivity.Store``, main.go:667)."""
        if n_new > 0:
            self._last_activity = self._clock()

    def idle_for(self) -> float:
        return self._clock() - self._last_activity

    def should_close(self, pipelines_running: bool = False) -> bool:
        """Inactivity close (main.go:620-636): no new sources within the
        timeout AND nothing still running → close once, stays closed."""
        if self.closed:
            return True
        if not pipelines_running and self.idle_for() >= self.policy.inactivity_timeout_s:
            self.closed = True
        return self.closed


def refill_claim(
    seeds,
    controller: RefillController,
    queued: int,
    available_workers: int,
    **claim_kwargs,
):
    """One refill step: watermark decision → :func:`claim_sources` with
    the computed limit. Returns (claimed_df_or_None, n_requested)."""
    from ..operators.frontier import claim_sources

    n = controller.need(queued, available_workers)
    if n <= 0:
        return None, 0
    return claim_sources(seeds, n, **claim_kwargs), n
