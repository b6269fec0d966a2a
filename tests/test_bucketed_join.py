"""Catalog-bucketed layout: the load-time shuffle buys shuffle-free joins.

Pins the core 100 TB claim in sources/bucketed.py: two tables bucketed
on the join key with the same n_buckets sort-merge-join with ZERO
Exchange nodes, while the identical join on plain parquet reads needs a
shuffle on each side. Also pins that single-table groupBy on the bucket
key reuses the layout (no hashpartitioning exchange).
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from qms_datawarehouse_spark.sources.bucketed import (
    colocated_join,
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", "o_orderkey", 8, str(root / "b_orders")
    )
    write_bucketed_table(
        lineitem, "b_lineitem", "l_orderkey", 8, str(root / "b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    j = colocated_join(spark, left, right, "o_orderkey", "l_orderkey").select(
        "o_orderkey", "o_orderpriority", "l_extendedprice"
    )
    n = j.count()
    assert n > 0
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert "Exchange" not in plan  # the whole point


def test_unbucketed_control_needs_shuffles(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").hint("merge")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    j = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select("o_orderkey", "o_orderpriority", "l_extendedprice")
    j.count()
    plan = _plan(j)
    assert plan.count("Exchange hashpartitioning") == 2


def test_groupby_on_bucket_key_reuses_layout(spark, bucketed_pair):
    _, right = bucketed_pair
    agg = spark.table(right).groupBy("l_orderkey").count()
    agg.count()
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan


def test_join_results_match_unbucketed(spark, bucketed_pair):
    left, right = bucketed_pair
    bucketed = (
        colocated_join(spark, left, right, "o_orderkey", "l_orderkey")
        .groupBy("o_orderpriority")
        .count()
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
