"""Source/sink spec seam (S12/S13) + JSON write-back round-trip."""

from __future__ import annotations

import json
import os

import pytest

from qms_datawarehouse_spark.sources.connectors import (
    SinkSpec,
    SourceSpec,
    json_source,
    mongo_sink,
    mongo_source,
    parquet_source,
    write_json,
)
from qms_datawarehouse_spark.sources.readers import valid_records


def test_parquet_spec_roundtrip(spark, tmp_path):
    df = spark.range(10).toDF("x")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    out = parquet_source(p).load(spark)
    assert out.count() == 10


def test_json_spec_keeps_corrupt_record_policy(spark, tmp_path):
    p = str(tmp_path / "in.ndjson")
    with open(p, "w") as f:
        f.write(json.dumps({"a": 1}) + "\n")
        f.write("{nope\n")
        f.write(json.dumps({"a": 2}) + "\n")
    # cache before counting: a count over the raw scan prunes columns
    # down to the corrupt-record filter alone, which Spark rejects
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = json_source(p).load(spark).cache()
    try:
        assert valid_records(df).count() == 2
    finally:
        df.unpersist()


def test_json_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "héllo"), (2, "world")], "id long, s string")
    out_dir = str(tmp_path / "out")
    write_json(df, out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".json")]
    assert len(files) == 1  # coalesced single-file dump
    back = spark.read.json(out_dir)
    assert {(r["id"], r["s"]) for r in back.collect()} == {(1, "héllo"), (2, "world")}


def test_sink_spec_json(spark, tmp_path):
    df = spark.range(3).toDF("x")
    out_dir = str(tmp_path / "sink")
    SinkSpec(format="json", path=out_dir).write(df)
    assert spark.read.json(out_dir).count() == 3


def test_mongo_seam_fails_with_actionable_error(spark):
    spec = mongo_source("mongodb://localhost:27017", "qms", "tickets")
    assert spec.format == "mongodb"
    with pytest.raises(RuntimeError, match="mongo-spark-connector"):
        spec.load(spark)


def test_mongo_sink_spec_shape():
    s = mongo_sink("mongodb://h", "db", "coll")
    assert s.mode == "append" and s.options["collection"] == "coll"


def test_unknown_builtin_error_passthrough(spark, tmp_path):
    # builtin formats surface Spark's own error, not the connector hint
    with pytest.raises(Exception) as ei:
        SourceSpec(format="parquet", path=str(tmp_path / "missing")).load(spark)
    assert "connector package" not in str(ei.value)


def test_csv_sink_roundtrip(spark, tmp_path):
    """F11: CSV serialization through the same sink seam (the
    reference's pandas to_csv path, dump.py CSV export)."""
    df = spark.createDataFrame([(1, "a,b"), (2, "c")], "id long, s string")
    out_dir = str(tmp_path / "csv")
    SinkSpec(format="csv", path=out_dir, options={"header": "true"}).write(df)
    back = spark.read.option("header", "true").csv(out_dir)
    assert {(r["id"], r["s"]) for r in back.collect()} == {("1", "a,b"), ("2", "c")}


def test_sqlite_roundtrip_through_spec_seam(spark, tmp_path):
    """S1/S12 against a REAL second system (stdlib sqlite3): DataFrame
    → SinkSpec(sqlitedb) → SourceSpec(sqlitedb) → sync_dataframe into
    the warehouse — the full reference hop (db.py:28-32 read,
    dump.py:22-31 batched insert) with no network and no jars."""
    import sqlite3

    from qms_datawarehouse_spark.engine import sync_dataframe
    from qms_datawarehouse_spark.sources.sqlite_connector import (
        register_sqlite,
        sqlite_sink,
        sqlite_source,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    register_sqlite(spark)
    db = str(tmp_path / "ext.db")

    df = spark.createDataFrame(
        [
            ("1", "alice", 10, "2024-01-01T00:00:00"),
            ("2", "bob", 20, "2024-01-02T00:00:00"),
            ("3", "carol", 30, "2024-01-03T00:00:00"),
        ],
        "_id string, name string, score long, updated_at string",
    )
    sqlite_sink(db, "people", mode="overwrite").write(df)

    # the external system really holds the rows
    with sqlite3.connect(db) as con:
        n, total = con.execute(
            "SELECT count(*), sum(score) FROM people"
        ).fetchone()
    assert (n, total) == (3, 60)

    back = sqlite_source(db, "people", num_partitions=2).load(spark)
    assert back.rdd.getNumPartitions() == 2  # rowid-range fan-out
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    res = sync_dataframe(wh, back, "sqlite://ext", "people")
    assert res.records_synced == 3
    assert wh.read("people").count() == 3


def test_sqlite_filter_pushdown_reaches_the_database(spark, tmp_path):
    """A cursor predicate on the scan must become SQL WHERE inside the
    connector — no post-scan Filter node left for Spark (the S1
    incremental-sync O(delta) contract at the source)."""
    from pyspark.sql import functions as F

    from qms_datawarehouse_spark.sources.sqlite_connector import (
        register_sqlite,
        sqlite_sink,
        sqlite_source,
    )

    register_sqlite(spark)
    db = str(tmp_path / "pd.db")
    df = spark.createDataFrame(
        [(i, f"2024-01-{i:02d}T00:00:00") for i in range(1, 21)],
        "id long, updated_at string",
    )
    sqlite_sink(db, "t", mode="overwrite").write(df)

    scan = sqlite_source(db, "t").load(spark).filter(
        F.col("updated_at") > "2024-01-15T00:00:00"
    )
    assert scan.count() == 5
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # pushed into the connector's SQL: no post-scan Filter node
    assert "Filter" not in plan.replace("RuntimeFilters: []", ""), plan


def test_sqlite_overwrite_vs_append_modes(spark, tmp_path):
    from qms_datawarehouse_spark.sources.sqlite_connector import (
        register_sqlite,
        sqlite_sink,
        sqlite_source,
    )

    register_sqlite(spark)
    db = str(tmp_path / "m.db")
    df = spark.createDataFrame([(1,), (2,)], "id long")
    sqlite_sink(db, "t", mode="overwrite").write(df)
    sqlite_sink(db, "t", mode="append").write(df)
    assert sqlite_source(db, "t").load(spark).count() == 4
    sqlite_sink(db, "t", mode="overwrite").write(df)
    assert sqlite_source(db, "t").load(spark).count() == 2
