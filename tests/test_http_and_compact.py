"""S7 HTTP-source shape (distributed fetch with injected transport)
and warehouse compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from qms_datawarehouse_spark.sources.http_source import fetch_reports, parse_reports


def test_http_source_fetch_and_parse(spark):
    users = spark.createDataFrame(
        [(f"AMINFO-{i:02d}-STAFF",) for i in range(40)], "username string"
    )
    resp = fetch_reports(users)
    rows = resp.collect()
    assert len(rows) == 40
    ok = [r for r in rows if r["status"] == 200]
    failed = [r for r in rows if r["status"] != 200]
    assert failed, "fake transport must exercise the error path"
    assert all(r["payload"] is None for r in failed)

    parsed = parse_reports(resp)
    out = parsed.collect()
    assert len(out) == len(ok)  # survivors only (scraper.py parity)
    assert all(r["room_user_name"].startswith("AMINFO-") for r in out)
    assert parsed.schema["total_tickets"].dataType.typeName() == "long"


def test_compact_consolidates_files_and_preserves_rows(spark, warehouse):
    from qms_datawarehouse_spark.operators.merge import merge_upsert

    # many tiny merges -> many small files
    for i in range(5):
        df = spark.createDataFrame(
            [{"_id": f"k{j}", "v": i} for j in range(i * 4, i * 4 + 4)]
        ).withColumn("updated_at", F.current_timestamp())
        merge_upsert(warehouse, "small", df, n_buckets=4)

    before = warehouse.read("small")
    n_before = before.count()
    vdir = warehouse.current_version_dir("small")
    files_before = len(glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True))

    warehouse.compact("small", sort_col="_id")
    after = warehouse.read("small")
    vdir2 = warehouse.current_version_dir("small")
    files_after = len(glob.glob(os.path.join(vdir2, "**", "*.parquet"), recursive=True))

    assert after.count() == n_before
    assert set(r["_id"] for r in after.collect()) == set(
        r["_id"] for r in before.collect()
    )
    assert files_after <= files_before
    assert files_after <= 4  # one file per touched bucket


def test_register_views_sql_front_door(spark):
    from qms_datawarehouse_spark.sources.readers import register_views

    from conftest import SF_DIR

    views = register_views(spark, SF_DIR)
    assert "orders" in views and "lineitem" in views
    out = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    ).collect()
    assert len(out) == 5
    assert sum(r["n"] for r in out) == spark.table("orders").count()


def test_fetcher_retry_policy_recovers_and_reports(spark):
    """S7 timeout/retry parity (reference scraper.py:47: 15s budget,
    failures dropped): transient 5xx recovers within the budget; a
    persistent failure is reported as a non-200 row (kept, not
    dropped); the time budget stops retries mid-sequence."""
    from qms_datawarehouse_spark.sources.http_source import (
        fetch_reports,
        with_retry_policy,
    )

    calls = {"flaky": 0, "dead": 0, "slow": 0}

    def flaky_transport(u):
        calls[u] += 1
        if u == "flaky":
            return (503, None) if calls[u] < 3 else (200, '{"ok":1}')
        if u == "dead":
            raise ConnectionError("boom")
        return (200, '{"ok":1}')

    naps = []
    fetch = with_retry_policy(
        flaky_transport, retries=3, timeout_sec=15.0,
        backoff_sec=0.1, clock=lambda: 0.0, sleep=naps.append,
    )
    assert fetch("flaky") == (200, '{"ok":1}')
    assert calls["flaky"] == 3 and naps == [0.1, 0.2]
    assert fetch("dead") == (599, None)  # kept with NULL payload
    assert calls["dead"] == 4  # 1 + 3 retries

    # budget exhaustion: a clock past the deadline stops retrying
    t = {"now": 0.0}

    def ticking():
        t["now"] += 10.0
        return t["now"]

    calls["slow"] = 0

    def always_503(u):
        calls[u] += 1
        return (503, None)

    fetch2 = with_retry_policy(
        always_503, retries=5, timeout_sec=15.0,
        backoff_sec=0.1, clock=ticking, sleep=lambda s: None,
    )
    assert fetch2("slow") == (503, None)
    # deadline = t10 + 15 = 25: attempts at t10 and t20 fit, the third
    # (t30) would blow the budget — 2 calls, not retries+1 = 6
    assert calls["slow"] == 2

    # the wrapped fetcher slots into the distributed fan-out unchanged
    # (stateless transport: the closure ships to executors by pickle)
    def stateless(u):
        return (200, '{"ok":1}') if u == "ok" else (503, None)

    users = spark.createDataFrame([("down",), ("ok",)], "username string")
    out = {
        r.username: r.status
        for r in fetch_reports(
            users,
            fetcher=with_retry_policy(stateless, retries=1, backoff_sec=0.0),
        ).collect()
    }
    assert out == {"ok": 200, "down": 503}


def test_compact_race_loser_gets_conflict(spark, warehouse):
    """Compaction is a read-modify-write (round 12): a writer landing
    between compact's read and its commit must surface
    ConcurrentWriteError — an un-pinned rewrite would resurrect the
    pre-race rows. The rival's merge must survive intact."""
    import datetime as dt
    from unittest import mock

    import pytest

    from qms_datawarehouse_spark.operators.merge import merge_upsert
    from qms_datawarehouse_spark.warehouse import (
        ConcurrentWriteError,
        ParquetWarehouse,
    )

    def batch(rows):
        return spark.createDataFrame(
            rows, "_id string, v long, updated_at timestamp"
        )

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    merge_upsert(
        warehouse, "t", batch([("a", 1, t1), ("b", 2, t1)]), n_buckets=4
    )

    real_write = ParquetWarehouse.write_version
    fired = {"done": False}

    def racing_write(self, table, df, **kw):
        if table == "t" and not fired["done"]:
            fired["done"] = True
            merge_upsert(warehouse, "t", batch([("c", 3, t2)]), n_buckets=4)
        return real_write(self, table, df, **kw)

    with mock.patch.object(ParquetWarehouse, "write_version", racing_write):
        with pytest.raises(ConcurrentWriteError):
            warehouse.compact("t", sort_col="_id")

    rows = {r["_id"]: r["v"] for r in warehouse.read("t").collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}, rows
    # a retry on the settled table succeeds
    warehouse.compact("t", sort_col="_id")
    rows = {r["_id"]: r["v"] for r in warehouse.read("t").collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}, rows
