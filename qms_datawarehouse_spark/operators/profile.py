"""One-pass table profiling (ANALYZE-style column statistics).

The reference trusts Postgres to know its tables (autovacuum/ANALYZE
keep pg_stats fresh; the service never profiles data itself). A
Spark warehouse has no resident statistics daemon, so the profiler is
an operator: per-column row/null/distinct counts and min/max, for
schema-drift monitoring, join-strategy sizing (is this dim still
broadcastable? is this key still unique?), and DQ baselines —
dq_constraint_checks asserts known rules; this MEASURES a table you
don't have rules for yet.

Scale shape: ONE scan of the table. All statistics are
partial-aggregatable and computed in a single ``agg`` (map-side
partials, one exchange). Exact multi-column ``count(DISTINCT ...)``
makes Catalyst expand the input ×n_cols — the right default at audit
scale and for the cross-engine oracle; at 100 TB pass
``exact=False`` and the distinct counts become HLL++ sketches
(``approx_count_distinct``), collapsing the plan back to plain
single-pass partial aggregation with fixed-size state. Note the
exact mode's LATENCY profile: the multi-distinct rewrite (Expand +
per-group FILTER aggregates over n_cols distinct groups) costs
~seconds of driver-side PLANNING per build — execution itself is
sub-second at test SF and scan-bound at scale. Interactive/repeated
profiling should use ``exact=False`` (also ~5× cheaper to plan). min/max are
serialized to strings per-type (ints/dates exactly; floats via
DECIMAL(18,2) so both engines print identical text; timestamps as
epoch micros per the registry's determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qms_datawarehouse_spark.plans.registry import query, tables


def _minmax_exprs(df: DataFrame, col: str):
    """(spark_min, spark_max) string-serialized per dtype."""
    dt = df.schema[col].dataType
    lo, hi = F.min(col), F.max(col)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        ser = lambda c: F.round(c, 2).cast("decimal(18,2)").cast("string")  # noqa: E731
    elif isinstance(dt, T.TimestampType):
        ser = lambda c: F.unix_micros(c).cast("string")  # noqa: E731
    else:  # integrals, strings, dates, booleans: cast is exact
        ser = lambda c: c.cast("string")  # noqa: E731
    return ser(lo), ser(hi)


def profile_table(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: every column) of ``df`` in one scan.

    Returns one row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    ``exact=False`` swaps count(DISTINCT) for approx_count_distinct —
    the 100 TB mode (no Expand, single-pass mergeable sketches).
    """
    cols = list(cols or df.columns)
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        lo, hi = _minmax_exprs(df, c)
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct(c).cast("long").alias(f"__nd_{c}"),
            lo.alias(f"__lo_{c}"),
            hi.alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __lo_{c}, __hi_{c}" for c in cols
    )
    return row.selectExpr(
        "__n",
        f"stack({len(cols)}, {stacked}) AS "
        "(col_name, __nn, n_distinct, min_value, max_value)",
    ).select(
        "col_name",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def _oracle_serializer(duck_type: str):
    if duck_type == "float":
        return lambda e: f"CAST(CAST(round({e}, 2) AS DECIMAL(18,2)) AS VARCHAR)"
    if duck_type == "ts":
        return lambda e: f"CAST(epoch_us({e}) AS VARCHAR)"
    return lambda e: f"CAST({e} AS VARCHAR)"


_ORDERS_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "float"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]

_PROFILE_SQL = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {_oracle_serializer(k)(f"min({c})")} AS min_value,
           {_oracle_serializer(k)(f"max({c})")} AS max_value
    FROM orders
    """
    for c, k in _ORDERS_COLS
)


@query("profile_orders", _PROFILE_SQL)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiler over every ``orders`` column, exact mode — each
    column's row/null/distinct counts and serialized min/max, all from
    ONE scan + one aggregate (the oracle needs six scans to say the
    same thing)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return profile_table(orders, [c for c, _ in _ORDERS_COLS], exact=True)
