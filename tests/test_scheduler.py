"""T6: interval runner — no overlap, coalesced catch-up, fail-isolated."""

from __future__ import annotations

import threading
import time

from qms_datawarehouse_spark.scheduler import IntervalRunner


def test_no_overlap_and_coalesce():
    active = 0
    max_active = 0
    lock = threading.Lock()

    def slow_job():
        nonlocal active, max_active
        with lock:
            active += 1
            max_active = max(max_active, active)
        time.sleep(0.15)
        with lock:
            active -= 1

    r = IntervalRunner(job=slow_job, interval_sec=999)

    # one thread runs; three ticks fire mid-run from other threads
    t = threading.Thread(target=r.tick)
    t.start()
    time.sleep(0.05)  # ensure the run is in flight
    results = [r.tick() for _ in range(3)]
    t.join()

    assert max_active == 1, "runs overlapped"
    assert results == [False, False, False], "mid-run ticks must coalesce"
    # 1 original + exactly 1 coalesced catch-up (not 3 queued runs)
    assert len(r.records) == 2
    assert r.records[1].coalesced_ticks == 3


def test_failures_do_not_stop_the_schedule():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("boom")

    r = IntervalRunner(job=flaky, interval_sec=999)
    r.tick()
    r.tick()
    assert [rec.ok for rec in r.records] == [False, True]
    assert r.records[0].error == "boom"


def test_threaded_start_stop():
    n = []
    r = IntervalRunner(job=lambda: n.append(1), interval_sec=0.05)
    r.start()
    time.sleep(0.3)
    r.stop()
    ran = len(n)
    assert ran >= 2
    time.sleep(0.12)
    assert len(n) == ran, "runner kept firing after stop"
