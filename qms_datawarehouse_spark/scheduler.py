"""T6: no-overlap interval execution of sync jobs.

Reference: APScheduler interval job with ``coalesce=True`` and
``max_instances=1`` (/root/reference/src/main.py:69-77) — one sync
runs at a time; ticks that fire while a run is in flight collapse
into a single catch-up run instead of queueing.

Spark-side equivalence: a Spark driver must never run two merges into
the same table concurrently (the version pointer swap is
last-writer-wins, so an overlapping slow run could clobber a newer
fast run). ``IntervalRunner`` serializes runs with a lock, coalesces
missed ticks, and records per-run outcomes; Structured Streaming's
``trigger(processingTime=...)`` gives the same no-overlap guarantee
natively for the streaming path (streaming/sync.py) — this runner is
the batch-mode parity of that trigger.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class RunRecord:
    started_monotonic: float
    duration_sec: float
    ok: bool
    coalesced_ticks: int  # ticks that fired while this run was pending
    error: str | None = None


@dataclass
class IntervalRunner:
    """Run ``job`` every ``interval_sec``, never overlapping.

    - ``max_instances=1``: a tick arriving while the job is running is
      NOT run concurrently; it sets a pending flag.
    - ``coalesce=True``: any number of ticks missed during one long run
      collapse into exactly ONE catch-up run.
    - fail-isolated: a raising job is recorded and the schedule
      continues (the reference logs and keeps the scheduler alive).

    ``tick()`` is exposed for deterministic tests and external clocks;
    ``start()`` drives it from a daemon thread timer.
    """

    job: Callable[[], object]
    interval_sec: float
    records: list[RunRecord] = field(default_factory=list)

    def __post_init__(self):
        self._run_lock = threading.Lock()
        self._state_lock = threading.Lock()
        self._pending_ticks = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- core ----------------------------------------------------------

    def tick(self) -> bool:
        """One schedule tick. Returns True if a run was executed NOW,
        False if it coalesced into an in-flight run's pending flag."""
        if not self._run_lock.acquire(blocking=False):
            with self._state_lock:
                self._pending_ticks += 1
            return False
        try:
            self._execute(coalesced=0)
            # catch-up: all ticks that arrived mid-run → ONE extra run
            while True:
                with self._state_lock:
                    pending, self._pending_ticks = self._pending_ticks, 0
                if pending == 0:
                    break
                self._execute(coalesced=pending)
            return True
        finally:
            self._run_lock.release()

    def _execute(self, coalesced: int) -> None:
        t0 = time.monotonic()
        try:
            self.job()
            self.records.append(RunRecord(t0, time.monotonic() - t0, True, coalesced))
        except Exception as exc:  # noqa: BLE001 — schedule survives job failure
            self.records.append(
                RunRecord(t0, time.monotonic() - t0, False, coalesced, str(exc)[:500])
            )

    # -- threaded driver ----------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("runner already started")
        self._stop.clear()

        def loop():
            while not self._stop.wait(self.interval_sec):
                self.tick()

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=timeout)
            self._thread = None
