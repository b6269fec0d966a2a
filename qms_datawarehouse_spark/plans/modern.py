"""Modern Spark-4 semi-structured surface: VariantType and Python
UDTFs.

The reference stores dynamic-schema documents whose nested parts the
engine serializes to JSON strings (SURVEY §1.1, §2.7 F3). Spark 4
adds two first-class tools for exactly that shape:

- **VariantType** (``parse_json``/``variant_get``): a binary-encoded
  semi-structured value with typed path extraction — the right 100 TB
  answer for "JSON column we filter and extract from constantly",
  because the variant encoding avoids re-parsing the raw string per
  expression (the repeated ``get_json_object`` pattern parses once
  PER CALL).
- **Python UDTF** (``@udtf``): the user-defined *table* function row
  in the §2.9 UDF/UDAF/UDTF surface. Demonstrated here with a JSON
  pair-exploder over a LATERAL join — arrow-optimized, but still a
  row-at-a-time Python path: the docstring contract is that anything
  expressible with built-ins (from_json + explode) should use them;
  the UDTF is for genuinely imperative row-to-rows logic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from qms_datawarehouse_spark.plans.registry import query, tables


# --------------------------------------------------------------------
# VariantType: typed path extraction from a JSON column
# --------------------------------------------------------------------


@query(
    "variant_props_agg",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def variant_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the ``props`` JSON column into a Variant once, extract
    ``$.k`` as a typed bigint, aggregate per event type. Unlike the
    string-path functions, the parse cost is paid once per row no
    matter how many paths are extracted — the scalable pattern for
    wide semi-structured access."""
    (events,) = tables(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json(F.col("props")), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------
# Python UDTF: row → rows with a LATERAL join (§2.9 U3)
# --------------------------------------------------------------------


@udtf(returnType="key string, val string", useArrow=True)
class JsonPairs:
    """Explode a JSON object into (key, value-as-string) rows,
    keys sorted for determinism. Scalars render via ``str`` (ints and
    strings only feed this query — float repr is NOT cross-engine
    stable and must not pass through here)."""

    def eval(self, js: str):
        try:
            d = json.loads(js) if js is not None else None
        except ValueError:
            return
        if not isinstance(d, dict):
            return
        for k, v in sorted(d.items()):
            if v is None:
                yield k, None
            elif isinstance(v, (dict, list)):
                yield k, json.dumps(v, separators=(",", ":"))
            else:
                yield k, str(v)


@query(
    "udtf_json_pairs",
    """
    SELECT 'event_type' AS key, count(*) AS n,
           count(DISTINCT event_type) AS n_vals
    FROM events
    UNION ALL
    SELECT 'user_id' AS key, count(*) AS n,
           count(DISTINCT CAST(user_id AS VARCHAR)) AS n_vals
    FROM events
    """,
)
def udtf_json_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface check: serialize (event_type, user_id) to JSON,
    lateral-explode it back to key/value rows with the ``JsonPairs``
    UDTF, and aggregate per key — the oracle recomputes the same
    counts straight from the columns, so every emitted pair is value-
    verified. LATERAL correlation fans the UDTF out per input row on
    the executors (no driver loop)."""
    (events,) = tables(spark, sf_dir, "events")
    spark.udtf.register("json_pairs", JsonPairs)
    events.select(
        F.to_json(F.struct("event_type", "user_id")).alias("js")
    ).createOrReplaceTempView("_udtf_events_js")
    return spark.sql(
        """
        SELECT p.key, count(*) AS n, count(DISTINCT p.val) AS n_vals
        FROM _udtf_events_js, LATERAL json_pairs(js) p
        GROUP BY p.key
        """
    )


# --------------------------------------------------------------------
# Recursive CTE (Spark 4): calendar dimension + gap-filled time series
# --------------------------------------------------------------------


@query(
    "calendar_fill_gaps",
    """
    WITH RECURSIVE cal(d) AS (
        SELECT DATE '2024-01-01' AS d
        UNION ALL
        SELECT d + INTERVAL 1 DAY FROM cal
        WHERE d < DATE '2024-02-29'
    ),
    daily AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT CAST(cal.d AS DATE) AS day, coalesce(daily.n, 0) AS n_events
    FROM cal LEFT JOIN daily ON cal.d = daily.d
    """,
)
def calendar_fill_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily event counts over a recursively generated
    calendar dimension (WITH RECURSIVE, new in Spark 4) — the
    time-series report where zero-activity days must appear as rows,
    which a plain GROUP BY can never produce. The recursion is
    driver-bounded (one row per day); the join against the aggregated
    fact is a broadcast of the tiny calendar side."""
    (events,) = tables(spark, sf_dir, "events")
    events.createOrReplaceTempView("_cal_events")
    return spark.sql(
        """
        WITH RECURSIVE cal(d) AS (
            SELECT DATE '2024-01-01' AS d
            UNION ALL
            SELECT d + INTERVAL 1 DAY FROM cal
            WHERE d < DATE '2024-02-29'
        ),
        daily AS (
            SELECT CAST(ts AS DATE) AS d, count(*) AS n
            FROM _cal_events GROUP BY 1
        )
        SELECT cal.d AS day, coalesce(daily.n, CAST(0 AS BIGINT)) AS n_events
        FROM cal LEFT JOIN daily ON cal.d = daily.d
        """
    )


# --------------------------------------------------------------------
# Semi-structured schema profiling: dynamic key discovery over JSON
# --------------------------------------------------------------------


@query(
    "json_schema_profile",
    """
    WITH kv AS (
        SELECT unnest(json_keys(props)) AS key, props FROM events
    )
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT json_extract_string(props, '$.' || key))
                AS BIGINT) AS n_distinct,
           min(TRY_CAST(json_extract_string(props, '$.' || key)
                        AS BIGINT)) AS min_val,
           max(TRY_CAST(json_extract_string(props, '$.' || key)
                        AS BIGINT)) AS max_val
    FROM kv GROUP BY key
    """,
)
def json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema inference over a semi-structured column: discover the
    key set DYNAMICALLY (no hardcoded paths — the reference's
    documents have no declared schema, SURVEY §1.1), then profile
    each key's presence, cardinality, and numeric range. The
    complement of variant_props_agg, which aggregates a KNOWN path;
    this is what an ingest pipeline runs first to decide the
    flattening (src/services/transform.py:33-42 parity).

    Scale shape: from_json to map + one explode, then a keyed
    partial aggregation — O(keys) output; the JSON parses once per
    row."""
    (events,) = tables(spark, sf_dir, "events")
    kv = events.select(
        F.explode(F.from_json("props", "map<string,string>")).alias(
            "key", "val"
        )
    )
    return kv.groupBy("key").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        # try_cast, NOT cast: this operator exists precisely for
        # unknown value types — a string-valued key must profile as
        # NULL range, not throw CAST_INVALID_INPUT under ANSI mode
        F.min(F.col("val").try_cast("long")).alias("min_val"),
        F.max(F.col("val").try_cast("long")).alias("max_val"),
    )


# --------------------------------------------------------------------
# Order-independent table content checksum (replication / CDC audit)
# --------------------------------------------------------------------

_CKSUM_SQL = """
    WITH h AS (
        SELECT o_orderpriority AS priority,
               CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                   CAST(o_custkey AS VARCHAR) || '|' ||
                   o_orderstatus || '|' ||
                   CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                        AS VARCHAR) || '|' ||
                   CAST(epoch_us(o_orderdate) AS VARCHAR)
               ), 1, 8))::UBIGINT AS BIGINT) AS rh
        FROM orders
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(rh) AS BIGINT) AS content_checksum
    FROM h GROUP BY priority ORDER BY priority
"""


@query("dq_content_checksum", _CKSUM_SQL)
def dq_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-INDEPENDENT content checksum per partition group — the
    replication/CDC-audit verifier: two copies of a table are
    content-equal iff their (count, checksum) rows match, regardless
    of row order, file layout or partitioning (sum is commutative).
    The row hash is the cross-engine md5-first-8-hex recipe
    (operators/hashsplit.py) over a canonical rendering that only
    ever stringifies EXACT types — doubles go through the cents
    fixed-point, timestamps through epoch micros — because float
    formatting is the one thing two engines never agree on.

    Scale shape: map-side row hash + one partial-aggregated groupBy —
    a full-table verification pass costs one scan and shuffles
    O(groups); comparing two 100 TB replicas is a join of two tiny
    checksum frames. The same per-group rows localize a divergence
    to a partition before any row-level diff runs."""
    (orders,) = tables(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
        F.unix_micros(F.col("o_orderdate")).cast("string"),
    )
    rh = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        orders.select(F.col("o_orderpriority").alias("priority"), rh.alias("rh"))
        .groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("rh").cast("long").alias("content_checksum"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------
# Categorical distribution drift between ingest epochs (PSI-style
# gate, exact integers)
# --------------------------------------------------------------------

_DRIFT_SQL = """
    WITH r AS (
        SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
        FROM events
    ),
    g AS (
        SELECT event_type,
               sum(CASE WHEN epoch_us(e.ts) < r.lo + (r.hi - r.lo) // 2
                        THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN epoch_us(e.ts) < r.lo + (r.hi - r.lo) // 2
                        THEN 0 ELSE 1 END) AS n2
        FROM events e, r
        GROUP BY event_type
    ),
    b AS (
        SELECT event_type, n1, n2,
               10000 * n1 // (SELECT sum(n1) FROM g) AS bp1,
               10000 * n2 // (SELECT sum(n2) FROM g) AS bp2
        FROM g
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(bp1 AS BIGINT) AS bp1,
           CAST(bp2 AS BIGINT) AS bp2,
           CAST(bp2 - bp1 AS BIGINT) AS delta_bp,
           CASE WHEN n1 = 0 THEN 'added'
                WHEN n2 = 0 THEN 'removed'
                WHEN abs(bp2 - bp1) >= 300 THEN 'shifted'
                ELSE 'stable' END AS drift_class
    FROM b
"""


@query("dq_distribution_drift", _DRIFT_SQL)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical distribution drift between two ingest epochs (the
    first and second halves of the event-time range): per category the
    basis-point share in each epoch, the share delta, and a drift
    class — added / removed / shifted (>= 300 bp) / stable. The
    population-stability gate a training pipeline runs on category
    mixes (event types, languages, sources) before trusting a new
    ingest window; the KS row (stats_ks_drift) is its continuous-value
    sibling.

    Exact integers end to end: the epoch cut is integer floor-division
    on epoch micros (Spark `div` ≡ DuckDB `//`), shares are
    10000·n div total — no PSI logarithm, so the gate hashes
    identically cross-engine and thresholds are auditable.

    Scale shape: one scan, conditional partial aggregation onto the
    CATEGORY domain, one |categories|-row window for the totals —
    nothing else moves. At 100 TB this is a metadata-cheap pre-commit
    check per ingest epoch."""
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    row = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).first()
    lo, hi = int(row["lo"]), int(row["hi"])
    cut = lo + (hi - lo) // 2

    in_e1 = (F.unix_micros("ts") < F.lit(cut)).cast("long")
    g = events.groupBy("event_type").agg(
        F.sum(in_e1).alias("n1"),
        F.sum(1 - in_e1).alias("n2"),
    )
    w = Window.partitionBy(F.lit(1))
    b = g.select(
        "event_type",
        "n1",
        "n2",
        F.expr("10000 * n1").alias("s1"),
        F.expr("10000 * n2").alias("s2"),
        F.sum("n1").over(w).alias("t1"),
        F.sum("n2").over(w).alias("t2"),
    ).withColumn(
        # loud on an empty epoch (all events share one timestamp →
        # the midpoint cut leaves epoch 1 empty): Spark's `div 0`
        # yields NULL while DuckDB errors — fail with a message
        # instead of silently diverging from the oracle
        "t1",
        F.when(
            (F.col("t1") == 0) | (F.col("t2") == 0),
            F.expr(
                "raise_error('dq_distribution_drift: an epoch is"
                " empty — event-time range too narrow')"
            ),
        ).otherwise(F.col("t1")),
    ).select(
        "event_type",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.expr("s1 div t1").cast("long").alias("bp1"),
        F.expr("s2 div t2").cast("long").alias("bp2"),
    )
    return b.select(
        "event_type",
        "n1",
        "n2",
        "bp1",
        "bp2",
        (F.col("bp2") - F.col("bp1")).cast("long").alias("delta_bp"),
        F.when(F.col("n1") == 0, "added")
        .when(F.col("n2") == 0, "removed")
        .when(F.abs(F.col("bp2") - F.col("bp1")) >= 300, "shifted")
        .otherwise("stable")
        .alias("drift_class"),
    )


# --------------------------------------------------------------------
# Per-feed freshness SLA audit
# --------------------------------------------------------------------

_FRESH_SLA_MIN = 60  # minutes behind the warehouse high-water mark

_FRESH_SQL = f"""
    WITH f AS (
        SELECT event_type, max(epoch_us(ts)) AS feed_hwm,
               count(*) AS n_events
        FROM events GROUP BY 1
    ),
    g AS (SELECT max(feed_hwm) AS global_hwm FROM f)
    SELECT event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(feed_hwm AS BIGINT) AS feed_hwm_us,
           CAST(global_hwm - feed_hwm AS BIGINT) AS lag_us,
           CAST((global_hwm - feed_hwm) // 60000000 AS BIGINT)
               AS lag_minutes,
           (global_hwm - feed_hwm) > CAST({_FRESH_SLA_MIN * 60000000} AS BIGINT)
               AS violates_sla
    FROM f, g
"""


@query("dq_freshness_sla", _FRESH_SQL)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness against the warehouse high-water mark: each
    event type's max timestamp, its lag behind the global max, and an
    SLA flag (> {_FRESH_SLA_MIN} min behind) — the first page of any
    warehouse health dashboard, and the gate a scheduler checks
    before running reports that assume all feeds have landed
    (reference analog: the sync-metadata freshness the warehouse's
    checkpoint table tracks per collection, src/services/etl.py's
    last-synced bookkeeping, surfaced as an audit).

    Exact integers: lags in epoch micros, minutes by floor division.
    Scale shape: one scan to a per-feed partial MAX (the cheapest
    aggregate there is), a 1-row global max combined broadcast-side;
    at 100 TB a real deployment reads the checkpoint metadata table
    instead of scanning — same output contract."""
    (events,) = tables(spark, sf_dir, "events")
    f = events.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("feed_hwm"),
        F.count("*").cast("long").alias("n_events"),
    )
    g = f.agg(F.max("feed_hwm").alias("global_hwm"))
    lag = F.col("global_hwm") - F.col("feed_hwm")
    return f.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n_events",
        F.col("feed_hwm").cast("long").alias("feed_hwm_us"),
        lag.cast("long").alias("lag_us"),
        F.expr(
            "CAST((global_hwm - feed_hwm) div 60000000 AS BIGINT)"
        ).alias("lag_minutes"),
        (lag > _FRESH_SLA_MIN * 60000000).alias("violates_sla"),
    )
