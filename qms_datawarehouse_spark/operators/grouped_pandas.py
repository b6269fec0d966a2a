"""Grouped-map ``applyInPandas`` surface (U2).

The rule in this engine is built-ins first (SURVEY §2.9: the
reference's per-cell UDF became ``to_json``/casts) — but when a
per-group computation genuinely needs library code (a scipy fit, a
model score), the grouped-map form is the right escape hatch: each
group arrives as ONE Arrow-backed pandas frame, processed natively,
returned columnar.

``normalized_order_values`` demonstrates the contract with per-customer
z-scores. It is deliberately an operation SQL CAN express (window
mean/std) so the pandas path is oracle-checked against the pure-SQL
answer — proving the escape hatch preserves semantics before you put
something SQL can't do inside it.

Scale: one shuffle on the grouping key; each group must fit in one
task's memory (the grouped-map contract) — fine for per-customer /
per-staff groups, wrong for whole-corpus groups; use mapInPandas +
pre-aggregation there instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

OUT_SCHEMA = "o_custkey long, o_orderkey long, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["o_totalprice"]
    sd = v.std(ddof=1)  # sample std == SQL stddev_samp
    z = (v - v.mean()) / sd if sd and sd > 0 else v * 0.0
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "zscore": z,
        }
    )


@query(
    "grouped_pandas_zscore",
    """
    SELECT o_custkey, o_orderkey,
           round(CASE WHEN stddev_samp(o_totalprice) OVER w > 0
                      THEN (o_totalprice - avg(o_totalprice) OVER w)
                           / stddev_samp(o_totalprice) OVER w
                      ELSE 0.0 END, 4) AS zscore
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY count(*) OVER w > 1
    """,
)
def grouped_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score of order values via grouped-map
    applyInPandas, oracle-checked against the window-function answer
    (groups of one are dropped — stddev_samp undefined)."""
    (orders,) = tables(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_custkey") <= 200).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    multi = src.groupBy("o_custkey").count().filter(F.col("count") > 1).select(
        "o_custkey"
    )
    return (
        src.join(F.broadcast(multi), "o_custkey")
        .groupBy("o_custkey")
        .applyInPandas(_zscore_group, schema=OUT_SCHEMA)
        .select("o_custkey", "o_orderkey", F.round("zscore", 4).alias("zscore"))
    )


def _zscore_group_arrow(key, table):
    """The same per-group computation on a raw ``pyarrow.Table``
    (``applyInArrow``): numpy math over zero-copy Arrow buffers —
    no pandas Series boxing. ddof=1 matches SQL stddev_samp."""
    import numpy as np
    import pyarrow as pa

    v = table.column("o_totalprice").to_numpy(zero_copy_only=False)
    sd = np.std(v, ddof=1) if len(v) > 1 else 0.0
    z = (v - v.mean()) / sd if sd > 0 else np.zeros_like(v)
    return pa.table(
        {
            "o_custkey": table.column("o_custkey"),
            "o_orderkey": table.column("o_orderkey"),
            "zscore": pa.array(z, type=pa.float64()),
        }
    )


@query(
    "grouped_arrow_zscore",
    """
    SELECT o_custkey, o_orderkey,
           round(CASE WHEN stddev_samp(o_totalprice) OVER w > 0
                      THEN (o_totalprice - avg(o_totalprice) OVER w)
                           / stddev_samp(o_totalprice) OVER w
                      ELSE 0.0 END, 4) AS zscore
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY count(*) OVER w > 1
    """,
)
def grouped_arrow_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouped_pandas_zscore`` on the ``applyInArrow`` surface —
    the same oracle, so both grouped-map APIs are value-checked to
    agree; prefer this form when the group computation is pure numpy
    (it skips the pandas conversion both ways)."""
    (orders,) = tables(spark, sf_dir, "orders")
    src = orders.filter(F.col("o_custkey") <= 200).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    multi = src.groupBy("o_custkey").count().filter(F.col("count") > 1).select(
        "o_custkey"
    )
    return (
        src.join(F.broadcast(multi), "o_custkey")
        .groupBy("o_custkey")
        .applyInArrow(_zscore_group_arrow, schema=OUT_SCHEMA)
        .select("o_custkey", "o_orderkey", F.round("zscore", 4).alias("zscore"))
    )
