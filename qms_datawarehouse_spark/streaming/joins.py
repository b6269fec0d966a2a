"""Stream-stream joins with watermark-bounded state.

The reference never correlates two live streams (each collection syncs
independently, SURVEY §2.8 T7); a streaming warehouse needs it the
moment two event feeds must be matched (ticket calls ⋈ ratings, clicks
⋈ purchases). Spark's stream-stream join buffers both sides in keyed
state; the watermark + time-range condition bound how long a row waits
for its partner, so state is O(join window), not O(stream).

``clicks_with_purchases``: inner-join click and purchase streams of
the same user where the purchase lands within ``window`` after the
click — the streaming twin of the batch bucketized range join
(operators/temporal.py), same semantics, incremental execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qms_datawarehouse_spark.streaming.sync import EVENTS_SCHEMA


def clicks_with_purchases(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    schema: T.StructType = EVENTS_SCHEMA,
) -> DataFrame:
    """Join each click to same-user purchases within ``window`` after
    it. Both sides watermarked — late rows beyond the mark are dropped
    from state instead of buffering forever."""
    events = spark.readStream.schema(schema).parquet(source_dir)
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window}")),
        "inner",
    ).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
