"""Iterative graph analytics in exact integer fixed point.

PageRank over the customer↔supplier trade graph (edges = distinct
(custkey, suppkey) pairs that actually traded, via lineitem⋈orders,
undirected as two directed edges). Companion to the two existing
iterative operators — ``connected_components`` (dedup.py: O(E)/round
label propagation) and ``embedding_kmeans_2iter`` (similarity.py:
fixed-point Lloyd) — extending the family with the canonical
damped-power-iteration shape.

Cross-engine determinism (the kmeans recipe, applied to ranks): total
rank mass is the integer 10¹² split uniformly; every division in the
update — per-edge contribution r div outdeg, the damping 85·m div
100, the teleport (15·(10¹²  div N)) div 100 — is int64 truncation,
identical in Spark ``div`` and DuckDB ``//`` on the non-negative
values ranks are. Iterations are therefore BYTE-identical across
engines and the unrolled 2-iteration loop gets full value-hash
verification (remainders dropped by integer division are a
deterministic mass leak — fine for a verifier; a production rank
would track 64-bit fixed point the same way).

Scale shape: one distinct over the (cust, supp) pair stream builds
the edge list; per iteration, contributions are ONE equi-join of the
K-node rank table to the edge list plus ONE dst-keyed sum — O(E)
shuffled per round, the same bound as connected_components. N (node
count) is a 1-row scalar broadcast. The final top-20 is a
total-ordered TakeOrdered cut, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

_MASS = 10**12  # total integer rank mass


def _pr_iterate(nodes: DataFrame, n: DataFrame, edges: DataFrame,
                deg: DataFrame, ranks: DataFrame) -> DataFrame:
    """One damped power-iteration step, all-integer. ``ranks`` has
    (node, r); returns the same shape."""
    contribs = (
        edges.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select("dst", F.expr("r div d").alias("m"))
    )
    agg = contribs.groupBy(F.col("dst").alias("node")).agg(
        F.sum("m").alias("m")
    )
    return (
        nodes.crossJoin(F.broadcast(n))
        .join(agg, "node", "left")
        .select(
            "node",
            F.expr(
                f"(15 * ({_MASS} div n)) div 100"
                " + (85 * coalesce(m, 0)) div 100"
            ).alias("r"),
        )
    )


_PAGERANK_SQL = f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT 'c:' || CAST(c AS VARCHAR) AS src,
               's:' || CAST(s AS VARCHAR) AS dst FROM pairs
        UNION ALL
        SELECT 's:' || CAST(s AS VARCHAR),
               'c:' || CAST(c AS VARCHAR) FROM pairs
    ),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, {_MASS} // nn.n AS r FROM nodes CROSS JOIN nn),
    c1 AS (
        SELECT e.dst AS node, sum(r0.r // deg.d) AS m
        FROM edges e JOIN r0 ON e.src = r0.node
                     JOIN deg ON e.src = deg.src
        GROUP BY 1
    ),
    r1 AS (
        SELECT nodes.node,
               (15 * ({_MASS} // nn.n)) // 100
               + (85 * coalesce(c1.m, 0)) // 100 AS r
        FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node
    ),
    c2 AS (
        SELECT e.dst AS node, sum(r1.r // deg.d) AS m
        FROM edges e JOIN r1 ON e.src = r1.node
                     JOIN deg ON e.src = deg.src
        GROUP BY 1
    ),
    r2 AS (
        SELECT nodes.node,
               (15 * ({_MASS} // nn.n)) // 100
               + (85 * coalesce(c2.m, 0)) // 100 AS r
        FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node
    )
    SELECT r2.node, CAST(deg.d AS BIGINT) AS degree,
           CAST(r2.r AS BIGINT) AS rank_mass
    FROM r2 JOIN deg ON r2.node = deg.src
    ORDER BY rank_mass DESC, node LIMIT 20
"""


@query("graph_pagerank_2iter", _PAGERANK_SQL)
def graph_pagerank_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact damped power iterations of PageRank over the
    customer↔supplier trade graph, in integer fixed point end-to-end
    — byte-identical cross-engine, so the iterative loop itself is
    value-hash verified (see module docstring for the determinism
    and O(E)-per-round scale argument). Returns the top-20 nodes by
    final rank mass with their degree, total-ordered
    (rank desc, node)."""
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    pairs = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.agg(F.count("*").alias("n"))
    r0 = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.expr(f"{_MASS} div n").alias("r")
    )
    r1 = _pr_iterate(nodes, n, edges, deg, r0)
    r2 = _pr_iterate(nodes, n, edges, deg, r1)
    out = (
        r2.join(deg, r2.node == deg.src)
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.col("r").cast("long").alias("rank_mass"),
        )
        .orderBy(F.desc("rank_mass"), "node")
        .limit(20)
    )
    return out
