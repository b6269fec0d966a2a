"""Incremental rollup maintenance must equal full recompute."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.rollup_hypertable import (
    aggregate_to_bucket,
    coarsen,
    update_rollups,
)
from qms_datawarehouse_spark.streaming.sync import EVENTS_SCHEMA


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_incremental_equals_full_recompute(spark, warehouse):
    t = dt.datetime(2024, 3, 1, 0, 0, 0)
    chunk1 = [
        (1, t + dt.timedelta(minutes=5), 1, "click", 1.0, None),
        (2, t + dt.timedelta(minutes=50), 1, "click", 3.0, None),
        (3, t + dt.timedelta(hours=2), 2, "view", 5.0, None),
    ]
    chunk2 = [
        (4, t + dt.timedelta(minutes=30), 1, "click", 7.0, None),  # same hour as 1
        (5, t + dt.timedelta(days=1, hours=1), 2, "view", 2.0, None),  # next day
    ]

    update_rollups(warehouse, _events(spark, chunk1))
    update_rollups(warehouse, _events(spark, chunk2))

    full_1h = aggregate_to_bucket(_events(spark, chunk1 + chunk2), "1 hour")
    full_1d = coarsen(full_1h, "1 day")

    for table, full in (("rollup_1h", full_1h), ("rollup_1d", full_1d)):
        got = {
            (r["bucket"], r["event_type"]): (
                r["n"], r["value_sum"], r["value_min"], r["value_max"]
            )
            for r in warehouse.read(table).collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (
                r["n"], r["value_sum"], r["value_min"], r["value_max"]
            )
            for r in full.collect()
        }
        assert got == want, table

    # read path: avg derives from partials
    daily = warehouse.read("rollup_1d")
    clicks = daily.filter(F.col("event_type") == "click").collect()
    assert len(clicks) == 1
    assert clicks[0]["n"] == 3
    assert clicks[0]["value_sum"] == 11.0


def test_rollup_update_inherits_untouched_days(spark, warehouse):
    """A delta landing in day-2 must not rewrite day-1's partition —
    same hardlink-inheritance contract as the keyed merge."""
    import os

    from qms_datawarehouse_spark.operators.rollup_hypertable import DAY_COL

    t = dt.datetime(2024, 3, 1, 12, 0, 0)
    day1 = [(1, t, 1, "click", 1.0, None), (2, t, 2, "view", 2.0, None)]
    day2 = [(3, t + dt.timedelta(days=1), 1, "click", 4.0, None)]

    update_rollups(warehouse, _events(spark, day1))
    v1 = warehouse.current_version_dir("rollup_1h")
    day1_dir = f"{DAY_COL}=2024-03-01"
    before = {
        f: os.stat(os.path.join(v1, day1_dir, f)).st_ino
        for f in os.listdir(os.path.join(v1, day1_dir))
        if f.endswith(".parquet")
    }

    update_rollups(warehouse, _events(spark, day2))
    v2 = warehouse.current_version_dir("rollup_1h")
    assert v2 != v1
    after = {
        f: os.stat(os.path.join(v2, day1_dir, f)).st_ino
        for f in os.listdir(os.path.join(v2, day1_dir))
        if f.endswith(".parquet")
    }
    assert after == before, "untouched day partition was rewritten"
    # both days readable, partials correct
    rows = warehouse.read("rollup_1h").count()
    assert rows == 3  # 2 hourly buckets day1 + 1 day2


def test_compact_preserves_day_partition_layout(spark, warehouse):
    """compact() must keep the table's actual partition column — a
    layout-stripping rewrite would make later partial updates unable
    to inherit untouched days (silent data loss)."""
    import os

    from qms_datawarehouse_spark.operators.rollup_hypertable import DAY_COL

    t = dt.datetime(2024, 3, 1, 12, 0, 0)
    update_rollups(warehouse, _events(spark, [
        (1, t, 1, "click", 1.0, None),
        (2, t + dt.timedelta(days=1), 2, "view", 2.0, None),
    ]))
    warehouse.compact("rollup_1h", sort_col="bucket")
    vdir = warehouse.current_version_dir("rollup_1h")
    assert any(e.startswith(f"{DAY_COL}=") for e in os.listdir(vdir)), (
        "compaction stripped the day-partition layout"
    )
    # and the incremental path still works afterwards
    update_rollups(warehouse, _events(spark, [
        (3, t + dt.timedelta(days=2), 1, "click", 4.0, None),
    ]))
    assert warehouse.read("rollup_1h").count() == 3


def test_all_null_value_bucket_sum_stays_null(spark, warehouse):
    """SQL sum semantics through the pairwise merge (round 12): a
    bucket whose every value is NULL across BOTH merged chunks must
    keep value_sum NULL — the old coalesce-to-0 pair collapsed it to
    0.0; a bucket NULL in one chunk and valued in the other takes the
    value."""
    t = dt.datetime(2024, 3, 1, 0, 0, 0)
    chunk1 = [
        (1, t + dt.timedelta(minutes=5), 1, "nullish", None, None),
        (2, t + dt.timedelta(minutes=10), 1, "mixed", None, None),
    ]
    chunk2 = [
        (3, t + dt.timedelta(minutes=30), 1, "nullish", None, None),
        (4, t + dt.timedelta(minutes=40), 1, "mixed", 4.0, None),
    ]
    update_rollups(warehouse, _events(spark, chunk1))
    update_rollups(warehouse, _events(spark, chunk2))

    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in warehouse.read("rollup_1h").collect()
    }
    assert got["nullish"] == (2, None), got   # NOT 0.0
    assert got["mixed"] == (2, 4.0), got

    # equivalence with the one-shot aggregate over all events
    full = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in aggregate_to_bucket(
            _events(spark, chunk1 + chunk2), "1 hour"
        ).collect()
    }
    assert got == full


def test_empty_delta_is_a_noop(spark, warehouse):
    """P6 for the rollup path (round 12): a quiet micro-batch must not
    write a version — version churn from empty deltas costs GC and
    CAS conflicts for nothing."""
    t = dt.datetime(2024, 3, 1)
    update_rollups(warehouse, _events(spark, [(1, t, 1, "click", 1.0, None)]))
    v_h = warehouse.current_version_name("rollup_1h")
    v_d = warehouse.current_version_name("rollup_1d")
    update_rollups(warehouse, _events(spark, []))
    assert warehouse.current_version_name("rollup_1h") == v_h
    assert warehouse.current_version_name("rollup_1d") == v_d


def test_concurrent_rollup_update_loser_gets_conflict(spark, warehouse):
    """The rollup merge is a read-modify-write of stored partials —
    a rival committing between our read and our commit must surface
    ConcurrentWriteError (round 12: base_version pins the commit),
    never silently drop the rival's counts."""
    from unittest import mock

    import pytest

    from qms_datawarehouse_spark.warehouse import (
        ConcurrentWriteError,
        ParquetWarehouse,
    )

    t = dt.datetime(2024, 3, 1)
    update_rollups(warehouse, _events(spark, [(1, t, 1, "click", 1.0, None)]))

    from qms_datawarehouse_spark.operators.transaction import (
        MultiTableTransaction,
    )

    real_commit = MultiTableTransaction.commit
    fired = {"done": False}

    def racing_commit(self, **kw):
        if not fired["done"]:
            fired["done"] = True
            update_rollups(
                warehouse,
                _events(spark, [(2, t, 2, "click", 5.0, None)]),
            )
        return real_commit(self, **kw)

    with mock.patch.object(
        MultiTableTransaction, "commit", racing_commit
    ):
        with pytest.raises(ConcurrentWriteError):
            update_rollups(
                warehouse,
                _events(spark, [(3, t, 3, "click", 7.0, None)]),
            )

    # the rival's fold is intact; retrying the loser converges
    update_rollups(warehouse, _events(spark, [(3, t, 3, "click", 7.0, None)]))
    got = {
        r["event_type"]: (r["n"], r["value_sum"])
        for r in warehouse.read("rollup_1h").collect()
    }
    assert got == {"click": (3, 13.0)}, got


def test_crash_between_level_flips_rolls_forward(spark, warehouse):
    """The cascade's cross-level crash window (round 12): both rollup
    levels commit in ONE transaction, so a crash between the two
    pointer flips leaves a journal that recovery rolls FORWARD —
    sequential commits diverged the levels permanently (additive
    partials are not replay-idempotent, so no later batch heals a
    missed one)."""
    from unittest import mock

    import pytest

    from qms_datawarehouse_spark.operators.transaction import (
        MultiTableTransaction,
        SimulatedCrash,
        recover_transactions,
    )

    t = dt.datetime(2024, 3, 1)
    update_rollups(warehouse, _events(spark, [(1, t, 1, "click", 1.0, None)]))

    real_commit = MultiTableTransaction.commit

    def crashing_commit(self, **kw):
        kw["_crash_after_repoints"] = 1
        return real_commit(self, **kw)

    with mock.patch.object(
        MultiTableTransaction, "commit", crashing_commit
    ):
        with pytest.raises(SimulatedCrash):
            update_rollups(
                warehouse, _events(spark, [(2, t, 2, "click", 5.0, None)])
            )

    # mid-crash: sorted flip order means rollup_1d advanced,
    # rollup_1h did not — the divergence the transaction exists for
    d_sum = warehouse.read("rollup_1d").agg(F.sum("n")).first()[0]
    h_sum = warehouse.read("rollup_1h").agg(F.sum("n")).first()[0]
    assert (d_sum, h_sum) == (2, 1), (d_sum, h_sum)

    recovered = recover_transactions(warehouse)
    assert len(recovered) == 1
    for table in ("rollup_1h", "rollup_1d"):
        got = {
            r["event_type"]: (r["n"], r["value_sum"])
            for r in warehouse.read(table).collect()
        }
        assert got == {"click": (2, 6.0)}, (table, got)
    # the next batch folds into the recovered state normally
    update_rollups(warehouse, _events(spark, [(3, t, 3, "view", 2.0, None)]))
    got = {
        r["event_type"]: r["n"]
        for r in warehouse.read("rollup_1d").collect()
    }
    assert got == {"click": 2, "view": 1}
