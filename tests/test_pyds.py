"""The ``docstore`` Python Data Source connector: shard-parallel
batch reads, connector-level filter pushdown, streaming offsets with
deterministic replay, and end-to-end composition with the incremental
sync engine."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


from qms_datawarehouse_spark.sources.pyds import register_docstore


def _write_shards(d, n_shards=3, per_shard=4):
    os.makedirs(d, exist_ok=True)
    for s in range(n_shards):
        with open(os.path.join(d, f"shard-{s}.jsonl"), "w") as fh:
            for i in range(per_shard):
                doc_id = s * per_shard + i
                fh.write(
                    json.dumps(
                        {
                            "_id": f"d{doc_id}",
                            "payload": f"p{doc_id}",
                            "updated_at": f"2024-01-{doc_id + 1:02d}T00:00:00Z",
                        }
                    )
                    + "\n"
                )
        # one corrupt line per shard — must be skipped, not fail
        with open(os.path.join(d, f"shard-{s}.jsonl"), "a") as fh:
            fh.write("{not json!!\n")


@pytest.fixture()
def docstore(spark, tmp_path):
    register_docstore(spark)
    d = str(tmp_path / "export")
    _write_shards(d)
    return d


def test_batch_read_shard_parallel(spark, docstore):
    df = spark.read.format("docstore").option("path", docstore).load()
    assert df.count() == 12  # corrupt lines skipped
    assert df.rdd.getNumPartitions() == 3  # one partition per shard
    assert set(df.columns) == {"_id", "payload", "updated_at"}
    assert df.filter(F.col("_id") == "d7").first()["payload"] == "p7"


def test_filter_pushdown_reaches_connector(spark, docstore):
    df = (
        spark.read.format("docstore")
        .option("path", docstore)
        .load()
        .filter(F.col("updated_at") > "2024-01-06T00:00:00Z")
    )
    rows = df.collect()
    # correct delta semantics (strict $gt on the ISO cursor)
    assert {r._id for r in rows} == {f"d{i}" for i in range(6, 12)}
    # ...and the predicate was absorbed by the connector: a pushed
    # filter leaves NO post-scan Filter node above the BatchScan
    # (pushFilters runs in the planning worker, so the plan shape is
    # the only externally observable evidence)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan docstore" in plan
    assert "Filter" not in plan.replace("RuntimeFilters: []", "")


def test_unsupported_filter_stays_with_spark(spark, docstore):
    df = (
        spark.read.format("docstore")
        .option("path", docstore)
        .load()
        .filter(F.col("_id").contains("d1"))  # StringContains: not pushed
    )
    assert df.count() == 3  # d1, d10, d11 — Spark evaluates it post-scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan.replace("RuntimeFilters: []", "")


def test_source_spec_resolves_docstore(spark, docstore):
    from qms_datawarehouse_spark.sources.connectors import SourceSpec

    df = SourceSpec(format="docstore", options={"path": docstore}).load(spark)
    assert df.count() == 12


def test_streaming_offsets_and_replay(spark, tmp_path):
    register_docstore(spark)
    log = str(tmp_path / "log.jsonl")
    ckpt = str(tmp_path / "ckpt")
    out_rows: list = []

    def run_batch():
        q = (
            spark.readStream.format("docstore")
            .option("path", log)
            .load()
            .writeStream.foreachBatch(
                lambda df, epoch: out_rows.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    with open(log, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({"_id": f"a{i}", "payload": "x",
                                 "updated_at": "2024-01-01T00:00:00Z"}) + "\n")
    run_batch()
    assert sorted(r._id for r in out_rows) == ["a0", "a1", "a2"]

    # append two more; restart from the checkpoint — only the delta
    with open(log, "a") as fh:
        for i in range(3, 5):
            fh.write(json.dumps({"_id": f"a{i}", "payload": "x",
                                 "updated_at": "2024-01-02T00:00:00Z"}) + "\n")
    out_rows.clear()
    run_batch()
    assert sorted(r._id for r in out_rows) == ["a3", "a4"]


def test_docstore_feeds_incremental_sync(spark, tmp_path, warehouse):
    """End-to-end: the connector is a drop-in source for the sync
    engine — string cursor coerced, keyed upsert, checkpoint."""
    from qms_datawarehouse_spark.engine import sync_dataframe

    register_docstore(spark)
    d = str(tmp_path / "export2")
    _write_shards(d, n_shards=2, per_shard=3)
    src = spark.read.format("docstore").option("path", d).load()
    res = sync_dataframe(warehouse, src, "docstore://export2", "docs")
    assert res.records_synced == 6
    assert warehouse.read("docs").count() == 6


def test_write_roundtrip_and_overwrite(spark, tmp_path):
    register_docstore(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [("a", "p1", "2024-01-01T00:00:00Z"), ("b", "p2", "2024-01-02T00:00:00Z")],
        "_id string, payload string, updated_at string",
    ).repartition(2)
    df.write.format("docstore").mode("append").option("path", out).save()
    back = spark.read.format("docstore").option("path", out).load()
    assert {(r._id, r.payload) for r in back.collect()} == {("a", "p1"), ("b", "p2")}
    # tasks stage privately; only committed shards are visible
    import os
    assert all(not n.startswith(".") or not n.endswith(".staging")
               for n in os.listdir(out))

    # overwrite replaces prior shards atomically at commit
    df2 = spark.createDataFrame(
        [("z", "p9", "2024-02-01T00:00:00Z")],
        "_id string, payload string, updated_at string",
    )
    df2.write.format("docstore").mode("overwrite").option("path", out).save()
    back2 = spark.read.format("docstore").option("path", out).load()
    assert [(r._id) for r in back2.collect()] == ["z"]


def test_stream_write_roundtrip_epoch_idempotent(spark, tmp_path):
    """readStream → writeStream through the connector: epochs publish
    atomically; a second availableNow run appends only the new delta
    (offsets from the checkpoint) with no duplicate rows."""
    register_docstore(spark)
    src = str(tmp_path / "in.jsonl")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format("docstore").option("path", src).load()
            .writeStream.format("docstore")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({"_id": f"a{i}", "payload": "x",
                                 "updated_at": "2024-01-01T00:00:00Z"}) + "\n")
    run()
    with open(src, "a") as fh:
        fh.write(json.dumps({"_id": "a3", "payload": "y",
                             "updated_at": "2024-01-02T00:00:00Z"}) + "\n")
    run()

    back = spark.read.format("docstore").option("path", out).load()
    rows = [r._id for r in back.collect()]
    assert sorted(rows) == ["a0", "a1", "a2", "a3"]  # no dups across epochs
    import os
    names = os.listdir(out)
    assert all(n.startswith("epoch-") for n in names if n.endswith(".jsonl"))
    assert not any(n.endswith(".staging") for n in names)
