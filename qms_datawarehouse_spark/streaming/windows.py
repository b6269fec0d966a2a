"""Windowed event analytics — batch form of the streaming aggregations
(T9), oracle-checked.

The same window specs run unchanged under ``readStream`` (see
sync.py:windowed_counts_stream); batch mode is how the driver's DuckDB
oracle can verify the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

SESSION_GAP_MIN = 30


@query(
    "t9_tumbling_hourly",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 tumbling window, batch form: F.window(ts, '1 hour') — the
    aligned window start equals date_trunc('hour'). Streaming variant
    adds only withWatermark."""
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_micros(F.col("window.start")).alias("hour_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "t9_sliding_daily",
    """
    WITH days AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    )
    SELECT day, count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM days GROUP BY 1
    """,
)
def daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity rollup — the per-day tumbling window the
    reference's staff report implies (A6/T9)."""
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.select(F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "t9_sessionization",
    f"""
    WITH ordered AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts,
               event_id
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {SESSION_GAP_MIN * 60}
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events,
           round(count(*) * 1.0 / count(DISTINCT session_id), 4)
               AS avg_events_per_session
    FROM sessions GROUP BY 1
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min ⇒ new session): lag + running sum
    of boundary flags — the batch dual of session_window(ts, gap) in
    streaming. One shuffle on user_id; both windows reuse it."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                > SESSION_GAP_MIN * 60
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(
            F.count("*") * 1.0 / F.countDistinct("session_id"), 4
        ).alias("avg_events_per_session"),
    )


# --------------------------------------------------------------------
# Session path analysis: top journey prefixes
# --------------------------------------------------------------------


@query(
    "session_path_analysis",
    f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts)
                            > {SESSION_GAP_MIN * 60}
                    THEN 1 ELSE 0 END AS new_session
        FROM ordered
    ),
    sess_ids AS (
        SELECT user_id, event_id, ts, event_type,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id, session_id ORDER BY ts, event_id
               ) AS step
        FROM sess_ids
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY step) AS path
        FROM sessions WHERE step <= 3
        GROUP BY user_id, session_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def session_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey prefixes: sessionize by the {SESSION_GAP_MIN}-
    minute inactivity gap (same construction as t9_sessionization),
    take each session's FIRST THREE event types in (ts, event_id)
    total order, and rank the resulting paths — the product-analytics
    "what do sessions start with" question, and the navigation-flow
    sibling of event_transitions (which is memoryless pairwise; this
    is ordered prefixes within real session boundaries).

    Scale shape: everything up to the path string is windows over ONE
    user-keyed exchange (gap flag, running session id, step rank share
    the partitioning); the path aggregation is keyed on (user,
    session); the final cut is a 20-row total-ordered take."""
    (events,) = tables(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (
                F.col("ts").cast("long")
                - F.lag("ts").over(w_order).cast("long")
                > SESSION_GAP_MIN * 60
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "step",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy(
                "ts", "event_id"
            )
        ),
    )
    paths = (
        sessions.filter(F.col("step") <= 3)
        .groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("step", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


# --------------------------------------------------------------------
# T4/T5: late & equal-cursor data across an incremental-sync epoch
# boundary — the reference's documented $gt data-loss caveat, replayed
# statelessly with cross-engine value verification
# --------------------------------------------------------------------

# Watermark delay for the windowed-admission mode (Structured
# Streaming rule: a batch-2 row is admitted iff its event time >=
# max(event time of batch 1) - delay).
_WM_HOURS = 24

_LATE_REPLAY_SQL = f"""
    WITH ev AS (
        SELECT event_id, date_trunc('hour', ts) AS cur,
               CAST(((event_id % 10) + 10) % 10 < 7 AS INT) AS in_e1
        FROM events
    ),
    b AS (SELECT max(cur) AS hwm FROM ev WHERE in_e1 = 1),
    modes AS (
        SELECT ev.event_id, ev.cur, ev.in_e1, m.mode, b.hwm,
               CASE m.mode
                   WHEN 'gt' THEN ev.cur > b.hwm
                   WHEN 'ge_dedup' THEN ev.cur >= b.hwm
                   ELSE ev.cur >= b.hwm - INTERVAL {_WM_HOURS} HOUR
               END AS in_delta
        FROM ev, b,
             (VALUES ('gt'), ('ge_dedup'), ('watermark_{_WM_HOURS}h'))
                 AS m(mode)
    )
    SELECT mode,
           CAST(sum(in_e1) AS BIGINT) AS n_epoch1,
           CAST(count(*) FILTER (in_delta) AS BIGINT) AS n_delta_rows,
           CAST(count(*) FILTER (in_delta AND in_e1 = 0) AS BIGINT)
               AS n_new_ids,
           CAST(count(*) FILTER (NOT in_delta AND in_e1 = 0) AS BIGINT)
               AS n_lost,
           CAST(sum(CASE WHEN in_e1 = 1 OR in_delta
                         THEN event_id ELSE 0 END) AS BIGINT)
               AS stored_id_sum
    FROM modes
    GROUP BY mode
    ORDER BY mode
"""


@query("watermark_late_replay", _LATE_REPLAY_SQL)
def watermark_late_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/T5 as a driver-verifiable row: replay ONE epoch boundary of
    the incremental sync over the events fixture and account for every
    late and equal-cursor event under the three admission policies —

    - ``gt``: the reference's strict ``$gt`` cursor (its etl.py
      documents the caveat): a second epoch admits only rows with
      cursor strictly past the epoch-1 high-water mark, so late
      arrivals AND rows sharing the boundary cursor value are lost.
    - ``ge_dedup``: the engine's documented improvement — ``>=``
      readmits the boundary tick (idempotent under the keyed merge;
      the boundary re-merge rows show up in n_delta_rows, exactly as
      ``sync_dataframe`` reports records_synced), saving equal-cursor
      stragglers but not older late data.
    - ``watermark_24h``: Structured Streaming's admission rule —
      batch-2 rows are kept iff event time >= max(batch-1 event time)
      - delay — recovering every late arrival inside the watermark.

    Arrival epochs derive from ``event_id`` parity-of-scale (pmod 10
    < 7 ⇒ epoch 1, a 70/30 split independent of event time, so ~30%%
    of every hour arrives 'late'); the cursor is hour-truncated (the
    coarse-granularity cursor under which the $gt caveat bites
    hardest — many events share one cursor tick). ``stored_id_sum``
    pins the exact stored id set per mode. The model is pinned equal
    to the REAL paths in tests/test_round7_invariants.py: gt/ge_dedup
    against two actual ``sync_dataframe`` epochs through a warehouse
    (records_synced and stored ids), watermark against an actual
    two-batch ``readStream`` + ``withWatermark`` run.

    Scale shape: one scan, a 1-row high-water-mark broadcast, a
    3-constant mode expansion, one aggregate — the same
    stateless-replay mold as cdc/ingest_gate_replay_two_epochs."""
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("cur"),
        (F.pmod(F.col("event_id"), F.lit(10)) < 7).cast("int").alias("in_e1"),
    )
    b = ev.filter(F.col("in_e1") == 1).agg(F.max("cur").alias("hwm"))
    modes = spark.createDataFrame(
        [("gt",), ("ge_dedup",), (f"watermark_{_WM_HOURS}h",)], "mode string"
    )
    in_delta = (
        F.when(F.col("mode") == "gt", F.col("cur") > F.col("hwm"))
        .when(F.col("mode") == "ge_dedup", F.col("cur") >= F.col("hwm"))
        .otherwise(
            F.col("cur")
            >= F.col("hwm") - F.expr(f"INTERVAL {_WM_HOURS} HOUR")
        )
    )
    m = (
        ev.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(modes))
        .withColumn("in_delta", in_delta)
    )
    return (
        m.groupBy("mode")
        .agg(
            F.sum("in_e1").cast("long").alias("n_epoch1"),
            F.sum(F.col("in_delta").cast("long")).cast("long").alias("n_delta_rows"),
            F.sum(
                (F.col("in_delta") & (F.col("in_e1") == 0)).cast("long")
            )
            .cast("long")
            .alias("n_new_ids"),
            F.sum(
                ((~F.col("in_delta")) & (F.col("in_e1") == 0)).cast("long")
            )
            .cast("long")
            .alias("n_lost"),
            F.sum(
                F.when(
                    (F.col("in_e1") == 1) | F.col("in_delta"), F.col("event_id")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("stored_id_sum"),
        )
        .orderBy("mode")
    )
