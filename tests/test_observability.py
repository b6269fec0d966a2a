"""T8: metrics registry, Observation-based plan metrics, structured
logs, and the sync engine's publication of all three."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from qms_datawarehouse_spark.observability import (
    METRICS,
    MetricsRegistry,
    log_event,
    observe_rows,
    record_sync_metrics,
)


def test_registry_counters_gauges_labels():
    r = MetricsRegistry()
    r.inc("runs", {"c": "a"})
    r.inc("runs", {"c": "a"})
    r.inc("runs", {"c": "b"})
    r.set_gauge("last", 7.0, {"c": "a"})
    assert r.value("runs", {"c": "a"}) == 2.0
    assert r.value("runs", {"c": "b"}) == 1.0
    assert r.value("last", {"c": "a"}) == 7.0
    snap = r.snapshot()
    assert {s["metric"] for s in snap} == {"runs", "last"}


def test_snapshot_df_is_queryable(spark):
    r = MetricsRegistry()
    r.inc("x")
    r.set_gauge("y", 3.5)
    df = r.snapshot_df(spark)
    got = {row["metric"]: row["value"] for row in df.collect()}
    assert got == {"x": 1.0, "y": 3.5}


def test_observe_rows_rides_the_plan(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id long, s string"
    )
    observed, obs = observe_rows(df, "probe", "s")
    assert observed.count() == 3  # the action that runs the plan
    assert obs.get == {"rows": 3, "null_s": 1}


def test_log_event_is_json():
    line = log_event("unit_test", collection="t", records=5)
    parsed = json.loads(line)
    assert parsed["event"] == "unit_test"
    assert parsed["records"] == 5
    assert "ts" in parsed


def test_sync_publishes_metrics(spark, warehouse):
    from qms_datawarehouse_spark.engine import sync_dataframe

    df = spark.createDataFrame(
        [("a", "2024-01-01T00:00:00", 1)], "_id string, updated_at string, v long"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    sync_dataframe(warehouse, df, "src", "obs_t")
    labels = {"source": "src", "collection": "obs_t"}
    assert METRICS.value("sync_runs_total", {**labels, "status": "SUCCESS"}) >= 1
    assert METRICS.value("last_sync_records", labels) == 1.0
    assert METRICS.value("last_sync_duration_sec", labels) > 0


def test_record_sync_metrics_failure_path():
    r = MetricsRegistry()
    record_sync_metrics(r, "s", "c", "FAILED", 0, 0.5)
    assert r.value("sync_runs_total", {"source": "s", "collection": "c", "status": "FAILED"}) == 1.0


def test_task_status_store_lifecycle():
    import pytest

    from qms_datawarehouse_spark.observability import TaskStatusStore, run_tracked

    store = TaskStatusStore()
    out = run_tracked("t1", "src_a", lambda: 42, status=store)
    assert out == 42
    assert store.hget("t1", "src_a") == "success: 42"

    def boom():
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        run_tracked("t1", "src_b", boom, status=store)
    assert store.hget("t1", "src_b").startswith("failed: nope")
    assert set(store.hgetall("t1")) == {"src_a", "src_b"}


def test_task_status_ttl_expires_whole_hash():
    """S14 TTL parity (reference routes.py:93 expire(task_id, 3600)):
    an armed task hash lapses after its TTL; unexpired tasks are
    untouched; expire() on a missing id reports False like Redis."""
    from qms_datawarehouse_spark.observability import TaskStatusStore

    now = {"t": 0.0}
    store = TaskStatusStore(clock=lambda: now["t"])
    store.hset("task1", "src_a", "running")
    store.hset("task2", "src_a", "running")
    assert store.expire("task1", 3600) is True
    assert store.expire("ghost") is False

    now["t"] = 3599.0
    assert store.hget("task1", "src_a") == "running"
    assert store.ttl("task1") == 1.0

    now["t"] = 3600.0
    assert store.hget("task1", "src_a") is None
    assert store.hgetall("task1") == {}
    assert store.ttl("task1") is None
    # no TTL armed on task2 → it persists
    assert store.hget("task2", "src_a") == "running"

    # sweep() evicts without an access touching the key
    store.hset("task3", "f", "v")
    store.expire("task3", 10)
    now["t"] = 3611.0
    assert store.sweep() == 1
    assert store.hgetall("task3") == {}


def test_run_tracked_arms_ttl():
    from qms_datawarehouse_spark.observability import (
        TaskStatusStore,
        run_tracked,
    )

    now = {"t": 0.0}
    store = TaskStatusStore(clock=lambda: now["t"])
    run_tracked("t1", "s", lambda: 42, status=store)
    assert store.hget("t1", "s") == "success: 42"
    assert store.ttl("t1") == TaskStatusStore.DEFAULT_TTL_SEC
    now["t"] = TaskStatusStore.DEFAULT_TTL_SEC + 1
    assert store.hgetall("t1") == {}
