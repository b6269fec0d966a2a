"""Durability properties of the versioned warehouse: a half-written
version is invisible (atomic pointer swap), and concurrent readers of
a superseded version survive GC (keep_versions retention)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("_id"), F.lit(tag).alias("tag")
    )


def test_partial_write_is_invisible(spark, warehouse):
    warehouse.write_version("t", _df(spark, 5, "v1"))

    # simulate a crashed writer: version dir exists, pointer never moved
    tdir = warehouse.table_dir("t")
    crashed = os.path.join(tdir, "v_deadbeef0000")
    os.makedirs(os.path.join(crashed, "partial"), exist_ok=True)

    out = warehouse.read("t")
    assert out.count() == 5
    assert {r["tag"] for r in out.collect()} == {"v1"}


def test_concurrent_reader_survives_one_gc_cycle(spark, warehouse):
    warehouse.write_version("t", _df(spark, 3, "old"))
    old_reader = warehouse.read("t")  # lazy — resolves the old dir

    warehouse.write_version("t", _df(spark, 4, "new"), keep_versions=2)
    # old version retained (keep=2) → the in-flight reader still works
    assert old_reader.count() == 3
    assert warehouse.read("t").count() == 4


def test_gc_eventually_removes_stale_versions(spark, warehouse):
    for i in range(5):
        warehouse.write_version("t", _df(spark, i + 1, f"v{i}"), keep_versions=1)
    tdir = warehouse.table_dir("t")
    versions = [d for d in os.listdir(tdir) if d.startswith("v_")]
    assert len(versions) <= 2  # current + 1 retained
    assert warehouse.read("t").count() == 5


def test_time_travel_reads_retained_versions(spark, warehouse):
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(1, "b"), (2, "c")], "id long, v string")
    warehouse.write_version("t", df1, keep_versions=3)
    warehouse.write_version("t", df2, keep_versions=3)

    hist = warehouse.list_versions("t")
    assert len(hist) == 2
    assert [h["is_current"] for h in hist] == [False, True]
    assert all(h["available"] for h in hist)
    assert hist[0]["committed_at"] <= hist[1]["committed_at"]

    old = warehouse.read("t", version=hist[0]["version"])
    assert [(r.id, r.v) for r in old.collect()] == [(1, "a")]
    assert warehouse.read("t").count() == 2


def test_time_travel_gc_marks_unavailable(spark, warehouse):
    for i in range(4):
        df = spark.createDataFrame([(i,)], "id long")
        warehouse.write_version("t", df, keep_versions=1)
    hist = warehouse.list_versions("t")
    assert len(hist) == 4
    assert hist[-1]["is_current"] and hist[-1]["available"]
    # keep_versions=1 → one retained non-current version; the oldest
    # are logged but GC'd
    assert not hist[0]["available"]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="garbage-collected"):
        warehouse.read("t", version=hist[0]["version"])
    # the retained previous version still reads
    prev = [h for h in hist if h["available"] and not h["is_current"]]
    assert prev and warehouse.read("t", version=prev[-1]["version"]).count() == 1


def test_table_stats_metadata_only(spark, warehouse):
    import datetime as dt

    from qms_datawarehouse_spark.operators.merge import merge_upsert

    df = spark.createDataFrame(
        [(str(i), i, dt.datetime(2024, 1, 1)) for i in range(50)],
        "_id string, v long, updated_at timestamp",
    )
    merge_upsert(warehouse, "t", df, n_buckets=8)
    stats = warehouse.table_stats("t", count_rows=True)
    assert stats["n_rows"] == 50
    assert stats["n_files"] >= 1 and stats["n_bytes"] > 0
    assert 1 <= stats["n_partitions"] <= 8  # _bucket= dirs
    assert stats["retained_versions"] >= 1
    assert stats["version"].startswith("v_")
