"""Distributed HTTP API source — the Spark shape of the reference's
concurrent staff-report scraper (/root/reference/scraper.py:30-61).

The reference fans out one aiohttp GET per username with
``asyncio.gather``, drops failures, and JSON-dumps the survivors. At
Spark scale the fan-out unit is a PARTITION of a usernames DataFrame:
``mapInPandas`` runs the fetch loop per Arrow batch on executors, so
10⁶ usernames spread over the cluster instead of one event loop, and
the result lands directly in a DataFrame (typed, joinable) instead of
a JSON file.

Transport is injected (``fetcher``): production passes a
requests/urllib3 session wrapper with auth headers and timeouts
(scraper.py:7-12,47 parity); tests and this container (no network)
pass a deterministic fake. Failure semantics mirror the reference:
a failed fetch yields status != 200 and a NULL payload — kept, not
dropped, so retry/audit queries can see them (strictly more
informative than scraper.py's silent None-drop; filter
``status == 200`` for the reference's exact behavior).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Fetcher = Callable[[str], tuple[int, str | None]]

RESPONSE_SCHEMA = "username string, status int, payload string"

#: reference scraper.py:47 — aiohttp.ClientTimeout(total=15)
DEFAULT_TIMEOUT_SEC = 15.0


def with_retry_policy(
    fetcher: Fetcher,
    retries: int = 2,
    timeout_sec: float = DEFAULT_TIMEOUT_SEC,
    backoff_sec: float = 0.2,
    clock=None,
    sleep=None,
) -> Fetcher:
    """Wrap a fetcher with the reference's failure semantics
    (scraper.py:47): a total time budget of ``timeout_sec`` per
    username and up to ``retries`` re-attempts on transport errors or
    5xx responses, exponential backoff between attempts. On
    exhaustion the username is NOT dropped — it yields the last
    status (599 for transport errors, the aiohttp-less stand-in for
    "connection failed") with a NULL payload, so the S7 audit/retry
    queries still see it; filter ``status == 200`` for the
    reference's exact survivors-only behavior.

    The budget gates BETWEEN attempts (a wrapped synchronous call
    can't be interrupted mid-flight — a real session enforces its own
    per-request timeout; pass it ``timeout_sec`` too). ``clock`` and
    ``sleep`` are injectable for deterministic tests.
    """
    import time as _time

    clock = clock or _time.monotonic
    sleep = sleep or _time.sleep

    def fetch(username: str) -> tuple[int, str | None]:
        deadline = clock() + timeout_sec
        status: int = 599
        for attempt in range(retries + 1):
            try:
                status, payload = fetcher(username)
            except Exception:
                status, payload = 599, None
            if status < 500:
                return status, payload
            if attempt < retries:
                pause = backoff_sec * (2 ** attempt)
                if clock() + pause >= deadline:
                    break  # budget exhausted: report the failure
                sleep(pause)
        return status, None

    return fetch


def fake_fetcher(username: str) -> tuple[int, str | None]:
    """Deterministic stand-in transport: 'fetches' a staff-report-
    shaped JSON for any username, failing every 7th (by name hash) to
    exercise the error path. Swap for a real HTTP session wrapper in
    production — the pipeline is transport-agnostic."""
    h = sum(username.encode())
    if h % 7 == 0:
        return (503, None)
    return (
        200,
        json.dumps(
            {
                "roomUserName": username,
                "totalTickets": h % 1000,
                "avgTicketsPerDay": round((h % 1000) / 30, 2),
            }
        ),
    )


def fetch_reports(
    usernames: DataFrame,
    fetcher: Fetcher = fake_fetcher,
    username_col: str = "username",
) -> DataFrame:
    """Partition-parallel HTTP fan-out: one fetch per row, executed
    inside mapInPandas batches on executors. Returns
    (username, status, payload-JSON)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = [fetcher(u) for u in pdf[username_col]]
            yield pd.DataFrame(
                {
                    "username": pdf[username_col],
                    "status": [s for s, _ in results],
                    "payload": [p for _, p in results],
                }
            )

    return usernames.mapInPandas(run, schema=RESPONSE_SCHEMA)


def parse_reports(responses: DataFrame) -> DataFrame:
    """Typed projection of successful fetches (scraper.py's survivors
    list, as a DataFrame): JSON payload → columns via from_json."""
    schema = (
        "roomUserName string, totalTickets long, avgTicketsPerDay double"
    )
    return (
        responses.filter(F.col("status") == 200)
        .withColumn("r", F.from_json("payload", schema))
        .select(
            F.col("r.roomUserName").alias("room_user_name"),
            F.col("r.totalTickets").alias("total_tickets"),
            F.col("r.avgTicketsPerDay").alias("avg_tickets_per_day"),
        )
    )
