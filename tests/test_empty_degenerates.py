"""Round-13 empty-input sweep of the maintenance layer (the verdict's
candidate class (a)): zero-row deltas, emptied bases, empty tables,
and whole-bucket drops through the REAL warehouse paths. These were
probed ad-hoc during the audit and found already-correct; this file
makes the coverage permanent so a refactor can't regress them
silently."""

from __future__ import annotations

import datetime as dt

from qms_datawarehouse_spark.operators.matview import (
    create_matview,
    refresh_matview,
)
from qms_datawarehouse_spark.operators.merge import merge_upsert

TS = dt.datetime(2024, 1, 1)
TS2 = dt.datetime(2024, 1, 2)

EV = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "_id string, grp string, amount long, updated_at timestamp"
    )


def test_bucketed_mv_bucket_empties_to_zero_rows(spark, warehouse):
    """The ONLY group in an MV bucket vanishes: the partial rewrite
    for that bucket carries zero rows and must still commit (an empty
    partition dir / dropped dir, not a crash or a stale leftover)."""
    merge_upsert(
        warehouse, "f",
        _batch(spark, [("a", "gA", 1, TS), ("b", "gB", 2, TS)]),
        n_buckets=4,
    )
    create_matview(warehouse, "mv", "f", ["grp"], ["amount"], n_buckets=8)
    merge_upsert(warehouse, "f", _batch(spark, [("a", "gB", 1, TS2)]),
                 n_buckets=4)
    refresh_matview(warehouse, "mv")
    got = {r.grp: (r._mv_n, r.amount_sum)
           for r in warehouse.read("mv").collect()}
    assert got == {"gB": (2, 3)}


def test_mv_full_refresh_on_emptied_base(spark, warehouse):
    """Destructive reload of the base to ZERO rows: the refresh must
    land an empty MV, not crash aggregating an empty frame."""
    merge_upsert(warehouse, "f", _batch(spark, [("a", "gA", 1, TS)]),
                 n_buckets=4)
    create_matview(warehouse, "mv", "f", ["grp"], ["amount"])
    warehouse.write_version("f", _batch(spark, []).limit(0))
    refresh_matview(warehouse, "mv")
    assert warehouse.read("mv").count() == 0


def test_compact_empty_table(spark, warehouse):
    warehouse.write_version("t", _batch(spark, []).limit(0))
    warehouse.compact("t", sort_col="_id")
    assert warehouse.read("t").count() == 0


def test_rollup_first_update_with_empty_delta(spark, warehouse):
    """First-ever update_rollups call with an empty delta: the empty-
    batch short-circuit (P6) must win over create-on-first-write —
    no tables, no versions, no crash."""
    from qms_datawarehouse_spark.operators.rollup_hypertable import (
        update_rollups,
    )

    update_rollups(warehouse, spark.createDataFrame([], EV))


def test_rollup_real_empty_real_sequence(spark, warehouse):
    from qms_datawarehouse_spark.operators.rollup_hypertable import (
        update_rollups,
    )

    update_rollups(warehouse, spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 7, "click", 1.0)], EV))
    update_rollups(warehouse, spark.createDataFrame([], EV))
    update_rollups(warehouse, spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 1, 6), 7, "view", 2.0)], EV))
    assert warehouse.read("rollup_1d").count() >= 1


def test_merge_upsert_empty_first_batch_then_real(spark, warehouse):
    empty = _batch(spark, []).limit(0)
    merge_upsert(warehouse, "t", empty, n_buckets=4)
    merge_upsert(warehouse, "t", _batch(spark, [("a", "g", 1, TS)]),
                 n_buckets=4)
    assert warehouse.read("t").count() == 1


def test_scd2_empty_input(spark):
    from qms_datawarehouse_spark.operators.temporal import scd2_from_stream

    df = spark.createDataFrame(
        [], "user_id long, state string, ts timestamp, event_id long"
    )
    assert scd2_from_stream(df, "user_id", "state", "ts", "event_id").count() == 0


def test_asof_empty_right_side(spark):
    from qms_datawarehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "user_id long, lts timestamp"
    )
    right = spark.createDataFrame([], "user_id long, rts timestamp, v long")
    out = asof_join(left, right, key="user_id", left_ts="lts",
                    right_ts="rts", right_cols=["v"])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["asof_v"] is None
