"""Mergeable-sketch rollup pin: unioning stored hourly HLL sketches
gives EXACTLY the estimate of sketching raw events at day grain — the
property that makes distinct-count rollups incremental at 100 TB
(re-aggregation reads O(hourly sketches), never raw events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from qms_datawarehouse_spark.operators.rollup_hypertable import (
    hll_rollup_estimate,
    hll_user_sketches,
)


def test_hourly_union_equals_direct_daily(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    hourly = hll_user_sketches(events, "hour")
    merged = hll_rollup_estimate(hourly, "day")
    direct = events.groupBy(F.date_trunc("day", "ts").alias("bucket_start")).agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
            "n_distinct_est"
        )
    )
    m = sorted(map(tuple, merged.collect()))
    d = sorted(map(tuple, direct.collect()))
    assert m == d
    assert len(m) > 0


def test_estimate_tracks_exact_at_fixture_scale(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    merged = {
        r[0]: r[1]
        for r in hll_rollup_estimate(
            hll_user_sketches(events, "hour"), "day"
        ).collect()
    }
    exact = {
        r[0]: r[1]
        for r in events.groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for k, est in merged.items():
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k])
