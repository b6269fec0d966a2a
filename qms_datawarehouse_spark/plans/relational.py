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


# --------------------------------------------------------------------
# TPC-H shape widening (q3, q10, q14, q15, q17, q18 analogs)
# --------------------------------------------------------------------


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most value in a quarter
    — returned-lineitem revenue through orders back to customer and
    nation. Scale: the quarter predicate prunes orders at the scan
    (PushedFilters on o_orderdate), returnflag prunes lineitem;
    nation broadcasts; top-20 is a TakeOrdered on the total order
    (revenue DESC, custkey)."""
    customer, orders, lineitem, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    l = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(customer, o.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_effect",
    """
    SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2) AS promo_revenue,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one ship-month —
    conditional aggregation over a fact⋈dim join. Scale: the month
    predicate reaches the lineitem scan; part broadcasts; the CASE
    rides the same partial aggregate as the total (one pass). The
    ratio is left to the reader — emitting both rounded sums avoids
    a float divide on the engine boundary."""
    part, lineitem = tables(spark, sf_dir, "part", "lineitem")
    l = lineitem.filter(
        (F.col("l_shipdate") >= "1997-09-01")
        & (F.col("l_shipdate") < "1997-10-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(part), l.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)),
                2,
            ).alias("promo_revenue"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    """
    WITH pl AS (
        SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
               l.l_extendedprice
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#11'
    ),
    stats AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qty) AS BIGINT) AS sq
        FROM pl GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_items,
           round(sum(pl.l_extendedprice), 2) AS total_price
    FROM pl JOIN stats ON pl.l_partkey = stats.l_partkey
    WHERE 5 * pl.qty * stats.n < stats.sq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue of small-quantity line items — quantity
    below 20% of the per-part average — for one brand. The
    correlated aggregate subquery is DE-CORRELATED into a per-part
    stats frame re-joined to the line items (the q2_min_cost_supplier
    recipe); the 0.2·avg comparison is cleared of division entirely
    (5·qty·n < Σqty — exact int64, quantities are integral in the
    fixture and cast-checked). Scale: the brand filter broadcasts
    part into the lineitem scan twice (stats + probe), both joins on
    l_partkey; no per-row subquery evaluation anywhere."""
    part, lineitem = tables(spark, sf_dir, "part", "lineitem")
    p = part.filter(F.col("p_brand") == "Brand#11")
    pl = (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            "l_extendedprice",
        )
    )
    stats = pl.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qty").cast("long").alias("sq"),
    )
    return (
        pl.join(stats, "l_partkey")
        .filter(5 * F.col("qty") * F.col("n") < F.col("sq"))
        .agg(
            F.count("*").cast("long").alias("n_small_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "q18_large_volume_customers",
    """
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3
    HAVING sum(CAST(l.l_quantity AS BIGINT)) > 250
    ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (total quantity > 250) with
    their customer. Quantities are integral — the HAVING threshold
    compares exact int64 sums, so the qualifying set is identical
    cross-engine. Scale: the lineitem pre-aggregation SHOULD fold
    before the customer join — grouping on (custkey, orderkey,
    orderdate) is orderkey-functional, so Catalyst partial-aggregates
    on the fact join key before touching customer; top-20 via
    TakeOrdered on (qty DESC, orderkey)."""
    customer, orders, lineitem = tables(
        spark, sf_dir, "customer", "orders", "lineitem"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )
