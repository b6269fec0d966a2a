"""The nightly maintenance runbook: recovery-first ordering, per-step
isolation, idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qms_datawarehouse_spark.maintenance import maintain
from qms_datawarehouse_spark.operators.matview import create_matview
from qms_datawarehouse_spark.operators.transaction import (
    MultiTableTransaction,
    SimulatedCrash,
)


def _df(spark, n, tag="x"):
    return spark.range(n).selectExpr(
        "id AS _id", f"'{tag}' AS tag", "CAST(id % 4 AS INT) AS _bucket"
    )


def test_maintain_full_pass(spark, warehouse):
    # (a) a crashed multi-table commit to recover
    warehouse.write_version("t1", _df(spark, 3, "old"))
    warehouse.write_version("t2", _df(spark, 3, "old"))
    txn = MultiTableTransaction(warehouse)
    txn.stage_write("t1", _df(spark, 5, "new"))
    txn.stage_write("t2", _df(spark, 6, "new"))
    with pytest.raises(SimulatedCrash):
        txn.commit(_crash_after_repoints=1)

    # (b) an abandoned staging to vacuum
    orphan = MultiTableTransaction(warehouse)
    orphan.stage_write("t1", _df(spark, 9, "abandoned"))

    # (c) a stale matview (base advances after creation)
    base = _df(spark, 10).withColumn("v", F.col("_id") * 2)
    warehouse.write_version("facts", base)
    create_matview(warehouse, "mv_facts", "facts", ["tag"], ["v"])
    warehouse.write_version("facts", base.unionByName(
        _df(spark, 3, "y").withColumn("v", F.lit(1))
    ))

    report = maintain(warehouse, orphan_min_age_sec=0.0)

    assert report.errors == {}
    assert report.recovered_txns == 1
    assert warehouse.read("t2").count() == 6          # roll-forward done
    assert any("t1/" in o for o in report.orphans_removed)
    assert report.refreshed.get("mv_facts") in {"incremental", "full"}

    # idempotent: second pass finds nothing to do
    again = maintain(warehouse, orphan_min_age_sec=0.0)
    assert again.recovered_txns == 0
    assert again.orphans_removed == []
    assert again.refreshed == {}


def test_maintain_isolates_failures(spark, warehouse, monkeypatch):
    warehouse.write_version("good", _df(spark, 3))
    warehouse.write_version("bad", _df(spark, 3))

    orig = warehouse.fragmented_partitions

    def exploding(table, *a, **kw):
        if table == "bad":
            raise RuntimeError("boom")
        return orig(table, *a, **kw)

    monkeypatch.setattr(warehouse, "fragmented_partitions", exploding)
    report = maintain(warehouse, orphan_min_age_sec=0.0)
    assert "compact:bad" in report.errors
    assert not any(k.startswith("compact:good") for k in report.errors)
