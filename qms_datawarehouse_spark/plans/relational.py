"""Relational operator coverage: joins (J2-J5), classic aggregation
shapes, point lookups, projections, top-K, rollup/cube.

These exercise the implied join graph of the QMS model (SURVEY §2.3:
fact⋈dim equi-joins, fact⋈fact on the shared key, denormalizing
pre-joins) on the driver fixtures, in the query shapes a warehouse
actually serves (TPC-H-style pricing summaries, filtered revenue,
top-K per group).

Scale notes: dims (region/nation/supplier/customer-as-dim) are
broadcast explicitly; fact⋈fact joins are equi-joins on orderkey
(bucket-able at scale); every aggregate is partial-aggregated map-side
by Catalyst; top-K per group is window + filter (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.skew import salted_join
from qms_datawarehouse_spark.plans.registry import query, tables


# --------------------------------------------------------------------
# J2: fact ⋈ dim equi-join (ticket ⋈ user analog)
# --------------------------------------------------------------------


@query(
    "j2_orders_customer",
    """
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_value,
           round(avg(o.o_totalprice), 4) AS avg_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (ticket⋈user on staffId): broadcast the dim, aggregate the
    fact. No fact shuffle — the join is map-side."""
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------
# J3: fact ⋈ fact equi-join (rating ⋈ ticket analog)
# --------------------------------------------------------------------


@query(
    "j3_lineitem_orders",
    """
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (rating⋈ticket on ticketId): fact-fact equi-join on the
    shared key. At scale both sides are bucketed on orderkey →
    shuffle-free sort-merge; here AQE picks the strategy."""
    lineitem, orders = tables(spark, sf_dir, "lineitem", "orders")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# J4: three-way join through two dims
# --------------------------------------------------------------------


@query(
    "j4_part_supplier",
    """
    SELECT p.p_brand AS brand,
           count(*) AS n_lines,
           round(sum(l.l_quantity), 2) AS total_qty,
           round(avg(s.s_acctbal), 4) AS avg_supp_bal
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (display_ticket⋈ticket analog widened): fact through two
    broadcast dims in one stage — Catalyst chains the hash joins
    inside a single whole-stage-codegen span."""
    lineitem, part, supplier = tables(spark, sf_dir, "lineitem", "part", "supplier")
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_acctbal")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_supp_bal"),
        )
    )


# --------------------------------------------------------------------
# J5: denormalizing pre-join (join-once-then-materialize)
# --------------------------------------------------------------------


@query(
    "j5_denormalized_orders",
    """
    SELECT o.o_orderkey, o.o_custkey, c.c_name AS customer_name,
           n.n_name AS nation_name, r.r_name AS region_name,
           round(o.o_totalprice, 2) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_totalprice > 400000
    """,
)
def denormalized_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 (scripts/seed_mock.py:51-55,63-65): the reference pre-joins
    denormalized names at write time; here the same wide row is
    produced by a broadcast-dim join chain, to be materialized once."""
    orders, customer, nation, region = tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------
# S8: warehouse point lookup by composite key
# --------------------------------------------------------------------


@query(
    "s8_point_lookup",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price,
           o_orderstatus
    FROM orders
    WHERE o_custkey = 42 AND o_orderstatus = 'F'
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (etl.py:89-100): composite-key equality lookup (P2). Both
    predicates reach the parquet scan as PushedFilters."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_custkey") == 42) & (F.col("o_orderstatus") == "F")
    ).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total_price"),
        "o_orderstatus",
    )


# --------------------------------------------------------------------
# P4: explicit column projection
# --------------------------------------------------------------------


@query(
    "p4_projection",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity < 5
    """,
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (etl.py:60-75): explicit column-list projection; the parquet
    ReadSchema shrinks to exactly these columns (column pruning)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return lineitem.filter(F.col("l_quantity") < 5).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


# --------------------------------------------------------------------
# TPC-H Q1 shape: pricing summary
# --------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→groupBy-many-aggs.
    Whole plan is one codegen span + one tiny shuffle (4 groups)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# TPC-H Q6 shape: filtered revenue delta
# --------------------------------------------------------------------


@query(
    "q6_revenue_filter",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive predicate, all
    pushed to parquet (range + between), ungrouped agg."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------
# Top-K per group (window)
# --------------------------------------------------------------------


@query(
    "topk_per_group",
    """
    SELECT segment, o_orderkey, total_price, rk FROM (
        SELECT c.c_mktsegment AS segment, o.o_orderkey,
               round(o.o_totalprice, 2) AS total_price,
               row_number() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS rk
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window rank + filter — no global sort; each
    group sorts within its shuffle partition (W4 surface)."""
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    w = Window.partitionBy("segment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            "o_totalprice",
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "segment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "rk",
        )
    )


# --------------------------------------------------------------------
# Rollup (beyond the reference — Spark/DuckDB both native)
# --------------------------------------------------------------------


@query(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP — subtotal rows labeled 'ALL'
    (grouping-set nulls coalesced for deterministic compare)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------
# Semi/anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------


@query(
    "semi_anti_join",
    """
    SELECT 'with_orders' AS side, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS side, count(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti — the merge operator's core primitives
    (survivors = target left_anti updates) surfaced as queries."""
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    keys = orders.select("o_custkey")
    semi = customer.join(
        keys, customer.c_custkey == keys.o_custkey, "left_semi"
    ).agg(F.count("*").alias("n")).select(F.lit("with_orders").alias("side"), "n")
    anti = customer.join(
        keys, customer.c_custkey == keys.o_custkey, "left_anti"
    ).agg(F.count("*").alias("n")).select(F.lit("without_orders").alias("side"), "n")
    return semi.unionByName(anti)


# --------------------------------------------------------------------
# Referential-integrity audit: orphan detection across the join graph
# --------------------------------------------------------------------


@query(
    "dq_referential_integrity",
    """
    SELECT 'orders->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem->part',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the star schema's FK edges:
    child rows with no matching parent (LEFT ANTI join per edge) —
    the warehouse-side check the reference delegates to PostgreSQL
    FK constraints (src/core/db.py table DDL); a lakehouse has no
    enforced constraints, so this audit IS the constraint. Companion
    to dq_constraint_checks (row-level predicates); this one is
    cross-table.

    Scale shape: each edge is one anti join on its key — broadcast
    when the parent is dim-sized, shuffle otherwise (AQE decides);
    output is O(edges)."""
    orders, customer, lineitem, part, supplier = tables(
        spark, sf_dir, "orders", "customer", "lineitem", "part", "supplier"
    )

    def edge(name, child, parent, ck, pk):
        # one lazy plan per edge: total ⨯ orphan count (both one-row
        # aggregates), no driver-side action
        n_child = child.agg(F.count("*").cast("long").alias("n_child"))
        n_orph = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").cast("long").alias("n_orphans"))
        )
        return n_child.crossJoin(n_orph).select(
            F.lit(name).alias("fk_edge"), "n_child", "n_orphans"
        )

    out = edge("orders->customer", orders, customer, "o_custkey", "c_custkey")
    for e in (
        edge("lineitem->orders", lineitem, orders, "l_orderkey", "o_orderkey"),
        edge("lineitem->part", lineitem, part, "l_partkey", "p_partkey"),
        edge(
            "lineitem->supplier", lineitem, supplier, "l_suppkey", "s_suppkey"
        ),
    ):
        out = out.unionByName(e)
    return out


# --------------------------------------------------------------------
# Skew-mitigating salted join (value-equal to the plain equi-join)
# --------------------------------------------------------------------

_SALTS = 8


@query(
    "join_salted_skew",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈fact join: the hot-key skew mitigation, proven
    value-equal to the plain equi-join (the oracle IS the unsalted
    join). Delegates to operators/skew.py's salted_join: the probe
    side (lineitem) gets a content-stable salt from a
    high-cardinality NON-key column; the build side (orders)
    replicates into S copies; the join key becomes (orderkey, salt),
    so a hot orderkey's rows spread over S shuffle partitions
    instead of hammering one.

    Scale shape: this is the manual remedy for skew the optimizer
    cannot split — AQE's skew-join only rebalances *sort-merge join*
    partitions; a skewed shuffle whose consumer is an aggregation, or
    a build side too big to replicate wholesale but fine to replicate
    S×, needs the salt. Cost model: S× replication of the build side
    vs the straggler tail of the hot key — S=8 caps the per-partition
    hot-key volume at 1/8th for a constant-factor build-side cost.
    The aggregation after the join is keyed on priority only, so the
    salt never reaches the result — bit-identical to the oracle."""
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    j = salted_join(
        lineitem,
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        key="l_orderkey",
        salt_source="l_linenumber",
        n_salt=_SALTS,
    )
    return j.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )
