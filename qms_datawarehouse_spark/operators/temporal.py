"""Temporal join operators Spark lacks natively: as-of join and
bounded range join.

The reference has no temporal joins (its only join is the keyed merge,
SURVEY §2.3), but its domain is event streams (`updatedAt` cursors,
ticket call/serve times) — as-of and windowed-range lookups are the
first queries a QMS analyst writes against that data ("what was the
last X before this Y"). Both operators here are expressed as
compositions of existing DataFrame ops (SURVEY's custom-operator
preference (a)), not UDFs:

- **as-of join** = tag both sides, union, one window pass per key with
  a last-non-null carry-forward. ONE shuffle on the join key, no range
  explosion, no per-row search — the distributed shape that survives
  100 TB (point-in-time joins in feature stores use exactly this).
- **range join** = time-bucketize both sides, equi-join on
  (key, bucket) with a bounded 2-bucket candidate fan-out, then exact
  range filter. Candidate cost is O(pairs in adjacent buckets), never
  O(left × right); Catalyst sees only equi-joins.

Oracles: DuckDB's native ``ASOF JOIN`` and a plain inequality join —
the Spark plans must reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

BUCKET_US = 3_600_000_000  # 1 hour in microseconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic distributed as-of join: for every left row, attach the
    columns of the latest right row with ``right_ts <= left_ts`` on the
    same ``key``. Right side must be unique per (key, right_ts).

    Shape: tagged union → window(partitionBy key, orderBy ts with
    right-before-left on ties) → last(ignorenulls) carry-forward →
    keep left rows. One shuffle total.
    """
    # a NULL-ts right row has no position on the timeline and must
    # match NOTHING (SQL asof: ts <= NULL is never true) — unfiltered
    # it sorts nulls-first and becomes a bogus "-infinity" match for
    # every left row. NULL-ts LEFT rows stay: they sort before any
    # real right row, carry no match, and surface with NULL asof cols.
    rtag = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    ltag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rtag.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = rtag.unionByName(ltag).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_cols],
    )


def _typed_events(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    (events,) = tables(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == etype)


@query(
    "asof_join_last_purchase",
    """
    WITH purchases AS (
        SELECT user_id, ts,
               max(event_id) AS p_event_id,
               arg_max(value, event_id) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS ts_us,
           p.p_event_id AS asof_p_event_id,
           round(p.p_value, 2) AS asof_p_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click annotated with the user's most recent
    purchase at click time (NULL if none yet). Right side reduced to
    unique (user, ts) first — ties broken by max event_id — so the
    match is deterministic on both engines."""
    purchases = (
        _typed_events(spark, sf_dir, "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    clicks = _typed_events(spark, sf_dir, "click").select("event_id", "user_id", "ts")
    out = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["p_event_id", "p_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "asof_p_event_id",
        F.round("asof_p_value", 2).alias("asof_p_value"),
    )


def _bucket(ts: Column) -> Column:
    return (F.unix_micros(ts) / BUCKET_US).cast("long")


@query(
    "range_join_purchases_1h",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id,
           count(p.ts) AS n_purchases_1h,
           round(coalesce(sum(p.value), 0), 2) AS sum_value_1h
    FROM clicks c
    LEFT JOIN purchases p
      ON p.user_id = c.user_id
     AND p.ts > c.ts - INTERVAL 1 HOUR
     AND p.ts <= c.ts
    GROUP BY 1, 2
    """,
)
def range_join_purchases_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: purchases within the hour before each
    click, aggregated per click. Implemented as a bucketized equi-join
    — each click probes its own and the previous 1-hour bucket (exact
    range re-checked after the join), so the plan contains only
    equi-joins with a fixed 2× candidate fan-out instead of a
    theta-join. The naive `ON a.ts BETWEEN ...` plan degenerates to
    broadcast-nested-loop at scale; this one shuffles on
    (user, bucket) and survives it."""
    clicks = _typed_events(spark, sf_dir, "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = _typed_events(spark, sf_dir, "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
        _bucket(F.col("ts")).alias("p_bucket"),
    )
    cand = clicks.withColumn(
        "probe_bucket", F.explode(F.array(_bucket(F.col("ts")) - 1, _bucket(F.col("ts"))))
    )
    hits = (
        cand.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("probe_bucket") == F.col("p_bucket")),
        )
        .filter(
            (F.col("p_ts") > F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("p_ts") <= F.col("ts"))
        )
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_purchases_1h"),
            F.round(F.sum("value"), 2).alias("sum_value_1h"),
        )
    )
    return clicks.join(hits, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_purchases_1h", F.lit(0)).alias("n_purchases_1h"),
        F.round(F.coalesce("sum_value_1h", F.lit(0.0)), 2).alias("sum_value_1h"),
    )


# --------------------------------------------------------------------
# SCD2: slowly-changing-dimension reconstruction from a change stream
# --------------------------------------------------------------------


def scd2_from_stream(
    updates: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Collapse a per-key change stream into type-2 dimension history:
    one row per *distinct consecutive value* of ``attr``, with
    ``valid_from``/``valid_to`` interval bounds and an ``is_current``
    flag on the open row.

    The warehouse-side complement to the sync engine's last-write-wins
    merge (reference keeps only the latest row per ``_id``,
    src/services/etl.py:68-75; SCD2 keeps the full attribute history —
    the standard audit/dimension pattern the reference's
    ``sync_history`` table gestures at).

    Rows with a NULL ``ts_col`` are dropped: an interval needs a
    start, and an unplaceable change event would otherwise sort
    nulls-first and make the first real-ts row open a spurious
    duplicate interval (its ``lag(ts)`` is NULL even when its value
    equals the preceding state).

    Two windows, both partitioned by ``key`` — one shuffle total, the
    second window reuses the partitioning (AQE keeps them in one
    exchange). Nothing global, nothing on the driver; scales as a
    single keyed window pipeline.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    # first-row detection must NOT ride the lagged ATTRIBUTE being
    # NULL — a NULL attr value is a legitimate dimension state, and
    # conflating the two broke both NULL directions: value→NULL
    # transitions vanished (x != NULL is NULL → filtered) and every
    # consecutive NULL opened a fresh history row. Lag the (non-null)
    # timestamp to mark true first rows, and compare values
    # null-safely (eqNullSafe = SQL IS DISTINCT FROM, negated).
    #
    # NULL-ts rows are dropped up front: a validity interval needs a
    # start, and a change event with no timestamp has no position on
    # the timeline. Left in, they'd also poison the first-row test —
    # they sort nulls-first, so the first REAL-ts row sees
    # lag(ts)=NULL and opens a spurious duplicate interval even when
    # its value equals the preceding state.
    changed = (
        updates.filter(F.col(ts_col).isNotNull())
        .withColumn("_prev", F.lag(attr).over(w))
        .withColumn("_prev_ts", F.lag(ts_col).over(w))
        .filter(
            F.col("_prev_ts").isNull()
            | ~F.col("_prev").eqNullSafe(F.col(attr))
        )
        .drop("_prev", "_prev_ts")
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


@query(
    "scd2_user_event_type",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev,
               lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_ts
        FROM events
    ),
    changed AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS is_current
    FROM changed
    """,
)
def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each user's event_type: consecutive duplicate
    states collapse, each surviving state carries its validity
    interval (epoch micros; open interval = current)."""
    (events,) = tables(spark, sf_dir, "events")
    out = scd2_from_stream(
        events.select("user_id", "event_type", "ts", "event_id"),
        key="user_id",
        attr="event_type",
        ts_col="ts",
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


@query(
    "scd2_asof_lookup",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ),
    changed AS (
        SELECT user_id, event_type AS state, ts AS valid_from, event_id
        FROM ordered WHERE prev IS NULL OR prev <> event_type
    ),
    states AS (
        SELECT user_id, state, valid_from FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id, valid_from ORDER BY event_id DESC
            ) AS rn FROM changed
        ) WHERE rn = 1
    ),
    purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           s.state, epoch_us(s.valid_from) AS state_from_us
    FROM purchases p
    ASOF LEFT JOIN states s
      ON p.user_id = s.user_id AND p.ts >= s.valid_from
    """,
)
def scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 history exists
    to answer: enrich each fact row (purchases) with the dimension
    state (the user's event_type run) valid AT the fact's timestamp,
    not the current one. Composes scd2_from_stream (interval
    reconstruction) with the distributed as-of join: intervals are
    consecutive, so matching the latest ``valid_from <= ts`` IS the
    interval-containment lookup — no valid_to predicate, no range
    explosion. Same-instant transitions collapse to the final state
    (event_id tiebreak) so the dim side is unique per (key, ts); a
    state starting exactly at the fact's ts applies to it (both
    engines: right-before-left tie order ⇔ ``>=`` as-of).

    Scale: two keyed windows (SCD2) + the tagged-union as-of pass —
    every exchange hashes user_id; feature-store point-in-time joins
    at 100 TB are exactly this plan."""
    (events,) = tables(spark, sf_dir, "events")
    dim = scd2_from_stream(
        events.select("user_id", "event_type", "ts", "event_id"),
        key="user_id",
        attr="event_type",
        ts_col="ts",
        tiebreak="event_id",
    )
    wdup = Window.partitionBy("user_id", "valid_from").orderBy(
        F.desc("event_id")
    )
    states = (
        dim.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            "valid_from",
            F.unix_micros("valid_from").alias("state_from_us"),
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        states,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=["state", "state_from_us"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_state").alias("state"),
        F.col("asof_state_from_us").alias("state_from_us"),
    )


@query(
    "asof_join_cogroup",
    """
    WITH purchases AS (
        SELECT user_id, ts,
               max(event_id) AS p_event_id,
               arg_max(value, event_id) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS ts_us,
           p.p_event_id AS asof_p_event_id,
           round(p.p_value, 2) AS asof_p_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as ``asof_join_last_purchase``, on the
    cogrouped-pandas surface (§2.9): each user's clicks and purchases
    arrive as two Arrow-batched frames and ``pandas.merge_asof`` does
    the per-key backward match. One co-partitioned shuffle on the key;
    per-group history must fit in task memory. The window-based
    ``asof_join`` stays the preferred JVM path — this variant exists
    to pin the cogroup API against the identical oracle, so both
    execution strategies are value-checked to agree."""
    import pandas as pd

    purchases = (
        _typed_events(spark, sf_dir, "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    clicks = _typed_events(spark, sf_dir, "click").select(
        "event_id", "user_id", "ts"
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts")
        right = right.sort_values("ts")
        out = pd.merge_asof(
            left,
            right[["ts", "p_event_id", "p_value"]],
            on="ts",
            direction="backward",  # latest purchase at/before the click
        )
        out["p_event_id"] = out["p_event_id"].astype("Int64")
        return out[["event_id", "user_id", "ts", "p_event_id", "p_value"]]

    matched = (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id long, user_id long, ts timestamp, "
            "p_event_id long, p_value double",
        )
    )
    return matched.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("p_event_id").alias("asof_p_event_id"),
        F.round("p_value", 2).alias("asof_p_value"),
    )


# --------------------------------------------------------------------
# Time-weighted average: interval-weighted value per user
# --------------------------------------------------------------------


@query(
    "time_weighted_avg",
    """
    WITH seg AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
               epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(sum(value_cents * dt_us) AS BIGINT) AS twa_num_cents_us,
           CAST(sum(dt_us) AS BIGINT) AS twa_den_us,
           CAST(sum(value_cents * dt_us) // sum(dt_us) AS BIGINT)
               AS twa_cents
    FROM seg WHERE dt_us IS NOT NULL
    GROUP BY 1
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user: each observation is
    weighted by how long it was the current one (last-observation-
    carried-forward until the next event). The hypertable-style
    continuous-aggregate companion to the rollup operators (no
    reference counterpart).

    Determinism: the weighted sum is EXACT integer arithmetic —
    value in cents (bigint) x interval in micros (bigint) — and the
    average is integer division, so Spark and the oracle agree bit for
    bit (float Σ(v·dt) would ulp-diverge between engines).

    Scale shape: lead() needs one hash exchange on user_id; the
    groupBy reuses the same partitioning (no second shuffle). State is
    one running (num, den) pair per user."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("value_cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "dt_us"
        ),
    ).filter(F.col("dt_us").isNotNull())
    return seg.groupBy("user_id").agg(
        F.sum(F.col("value_cents") * F.col("dt_us")).alias("twa_num_cents_us"),
        F.sum("dt_us").alias("twa_den_us"),
        F.expr(
            "sum(value_cents * dt_us) div sum(dt_us)"
        ).alias("twa_cents"),
    )


# --------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# --------------------------------------------------------------------


@query(
    "event_transitions",
    """
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST((n * 10000)
                // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
                AS BIGINT) AS prob_bp
    FROM t
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every (from_type → to_type) step, the observed count
    and transition probability in basis points — session-model /
    next-action analytics.

    Scale shape: lead() shuffles once on user_id; the pair count then
    reduces |types|² rows, and the probability window runs over that
    O(|types|²) aggregate, never the event stream. Probabilities are
    exact integer basis points (n·10⁴ div Σn), so rows hash
    identically across engines."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "CAST((n * 10000) div sum(n) over"
            " (partition by from_type) AS BIGINT)"
        ).alias("prob_bp"),
    )


# --------------------------------------------------------------------
# Keyless interval containment (global incident windows × events)
# --------------------------------------------------------------------

# 5-minute incident windows opened by every 'error' event; which
# click/view traffic fell inside ANY window? Unlike
# range_join_purchases_1h there is NO shared key — the equi-join is
# on the time bucket alone, which is exactly the hard case for a
# naive engine (a BNLJ over intervals × points). Bucketing bounds the
# candidates at Σ_b (intervals_b × points_b) — per-bucket density,
# never |intervals| × |points|.
_IV_LEN_US = 300_000_000  # 5 minutes


@query(
    "interval_containment_join",
    f"""
    WITH e AS (SELECT event_id, event_type, value, epoch_us(ts) AS us
               FROM events),
    iv AS (SELECT us AS s_us FROM e WHERE event_type = 'error'),
    ib AS (SELECT s_us,
                  unnest(generate_series(s_us // {_IV_LEN_US},
                                         (s_us + {_IV_LEN_US - 1}) // {_IV_LEN_US}))
                      AS bucket
           FROM iv),
    p AS (SELECT event_id, event_type, value, us,
                 us // {_IV_LEN_US} AS bucket
          FROM e WHERE event_type IN ('click', 'view')),
    pairs AS (
        SELECT p.event_id, p.event_type, p.value,
               count(*) AS n_windows
        FROM p JOIN ib ON p.bucket = ib.bucket
           AND p.us >= ib.s_us AND p.us < ib.s_us + {_IV_LEN_US}
        GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(n_windows) AS BIGINT) AS n_pairs,
           round(sum(value), 2) AS total_value
    FROM pairs GROUP BY 1
    """,
)
def interval_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless interval-containment join: every 'error' event opens a
    5-minute incident window; count the click/view events falling in
    at least one window (impact analysis / blast-radius attribution).
    The oracle is the plain inequality join — DuckDB runs it as an
    IEJoin; Spark would run it as a BroadcastNestedLoopJoin, the plan
    that dies at scale.

    Scale shape: both sides bucketize to floor(us / 300s); an
    interval overlaps at most 2 buckets (sequence fan-out ≤ 2×,
    bounded by interval_len/bucket_len + 1), a point exactly 1. The
    join Catalyst sees is a pure EQUI-join on bucket followed by the
    exact containment filter — candidates are Σ per-bucket
    (intervals × points), i.e. local density, never the |iv|·|p|
    cross product. The containment-count agg is keyed on the point
    id (distributes); the final rollup is a tiny 2-row aggregate.
    This is the keyless sibling of range_join_purchases_1h — when no
    equi-key exists, the time bucket IS the manufactured equi-key
    (the Databricks range-join-hint / bin-join strategy)."""
    (events,) = tables(spark, sf_dir, "events")
    e = events.select(
        "event_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    iv = e.filter(F.col("event_type") == "error").select(
        F.col("us").alias("s_us")
    )
    ib = iv.select(
        "s_us",
        F.explode(
            F.sequence(
                F.expr(f"s_us div {_IV_LEN_US}"),
                F.expr(f"(s_us + {_IV_LEN_US - 1}) div {_IV_LEN_US}"),
            )
        ).alias("bucket"),
    )
    p = e.filter(F.col("event_type").isin("click", "view")).select(
        "event_id",
        "event_type",
        "value",
        "us",
        F.expr(f"us div {_IV_LEN_US}").alias("bucket"),
    )
    pairs = (
        p.join(ib, "bucket")
        .filter(
            (F.col("us") >= F.col("s_us"))
            & (F.col("us") < F.col("s_us") + _IV_LEN_US)
        )
        .groupBy("event_id", "event_type", "value")
        .agg(F.count("*").alias("n_windows"))
    )
    return pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum("n_windows").cast("long").alias("n_pairs"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "scd2_null_states",
    """
    WITH src AS (
        SELECT user_id, nullif(event_type, 'click') AS state, ts, event_id
        FROM events
    ),
    ordered AS (
        SELECT user_id, state, ts, event_id,
               lag(state) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev,
               lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_ts
        FROM src
    ),
    changed AS (
        SELECT user_id, state, ts, event_id FROM ordered
        WHERE prev_ts IS NULL OR prev IS DISTINCT FROM state
    )
    SELECT user_id, state,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS is_current
    FROM changed
    """,
)
def scd2_null_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 with NULL as a first-class dimension state (round 12):
    the commonest event_type ('click') is NULLed before history
    reconstruction, so the stream is dense with value→NULL,
    NULL→value, and NULL→NULL transitions — the three the old
    ``prev != attr`` / ``prev IS NULL`` detection got wrong (dropped,
    dropped, and duplicated respectively). Consecutive NULL states
    must collapse into ONE interval; NULL↔value boundaries must open
    rows. Oracle states the identical semantics with
    ``prev_ts IS NULL OR prev IS DISTINCT FROM state``.

    Evidence guard: the output must contain NULL-state rows AND fewer
    of them than the input's click rows — proof the NULL runs really
    collapsed rather than passing through one-per-event."""
    (events,) = tables(spark, sf_dir, "events")
    src = events.select(
        "user_id",
        F.expr("nullif(event_type, 'click')").alias("state"),
        "ts",
        "event_id",
    )
    out = scd2_from_stream(
        src, key="user_id", attr="state", ts_col="ts", tiebreak="event_id"
    )
    n_null_rows = out.filter(F.col("state").isNull()).count()
    n_clicks = events.filter(F.col("event_type") == "click").count()
    if not (0 < n_null_rows < n_clicks):
        raise AssertionError(
            f"NULL-state fixture degenerate: {n_null_rows} null-state "
            f"rows vs {n_clicks} click events"
        )
    return out.select(
        "user_id",
        "state",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


@query(
    "scd2_null_ts",
    """
    WITH src AS (
        SELECT user_id, event_type,
               CASE WHEN ((event_id % 7) + 7) % 7 = 3 THEN NULL
                    ELSE ts END AS ts,
               event_id
        FROM events
    ),
    placed AS (
        SELECT * FROM src WHERE ts IS NOT NULL
    ),
    ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev,
               lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_ts
        FROM placed
    ),
    changed AS (
        SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to_us,
           lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL AS is_current
    FROM changed
    """,
)
def scd2_null_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over a change stream containing NULL timestamps (round
    13): every 7th event's ``ts`` is NULLed before history
    reconstruction. An unplaceable change event carries no position
    on the validity timeline, so ``scd2_from_stream`` drops it; the
    oracle states the same semantics with ``WHERE ts IS NOT NULL``
    before the windows. The pre-fix code kept NULL-ts rows — they
    sort nulls-first, so each key's first REAL-ts row saw
    ``lag(ts) = NULL`` and opened a spurious duplicate interval even
    when its value equalled the preceding state (plus emitted
    NULL-``valid_from`` rows outright) — both hash-visible here.

    Evidence guard: the manufactured input must actually contain
    NULL-ts rows, and the output must contain none of their residue
    (no NULL ``valid_from``) — fail loudly, never a trivial match."""
    (events,) = tables(spark, sf_dir, "events")
    src = events.select(
        "user_id",
        "event_type",
        F.when(F.pmod("event_id", F.lit(7)) == 3, F.lit(None))
        .otherwise(F.col("ts"))
        .alias("ts"),
        "event_id",
    )
    n_null_ts = src.filter(F.col("ts").isNull()).count()
    if n_null_ts <= 0:
        raise AssertionError("NULL-ts fixture degenerate: no NULL ts rows")
    out = scd2_from_stream(
        src, key="user_id", attr="event_type", ts_col="ts",
        tiebreak="event_id",
    )
    if out.filter(F.col("valid_from").isNull()).count() != 0:
        raise AssertionError(
            "NULL-ts rows leaked into the history as NULL valid_from"
        )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


@query(
    "asof_null_ts",
    """
    WITH purchases AS (
        SELECT user_id,
               CASE WHEN ((event_id % 3) + 3) % 3 = 0 THEN NULL ELSE ts END
                   AS ts,
               max(event_id) AS p_event_id,
               arg_max(value, event_id) AS p_value
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS ts_us,
           p.p_event_id AS asof_p_event_id,
           round(p.p_value, 2) AS asof_p_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_null_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join with a third of the right side's timestamps
    NULLed (round 12): SQL asof semantics say ``ts >= NULL`` is never
    true, so those rows must match NOTHING — the old tagged-union
    sorted them nulls-first and carried them as a bogus "-infinity"
    match for every click on the key. The oracle is DuckDB's native
    ASOF LEFT JOIN over the identically-NULLed right side.

    Evidence guard: the NULLed subset must be non-empty and some
    clicks must still match (the row tests exclusion, not an empty
    join)."""
    (events,) = tables(spark, sf_dir, "events")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withColumn(
            "ts",
            F.when(
                F.pmod(F.col("event_id"), F.lit(3)) == 0, F.lit(None)
            ).otherwise(F.col("ts")),
        )
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
    )
    n_nulled = purchases.filter(F.col("ts").isNull()).count()
    if not n_nulled:
        raise AssertionError("asof NULL fixture degenerate: no NULL ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["p_event_id", "p_value"],
    )
    if out.filter(F.col("asof_p_event_id").isNotNull()).isEmpty():
        raise AssertionError("asof NULL fixture degenerate: zero matches")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "asof_p_event_id",
        F.round("asof_p_value", 2).alias("asof_p_value"),
    )
