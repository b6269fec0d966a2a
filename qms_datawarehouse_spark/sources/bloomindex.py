"""Bloom-filter partition index: membership pruning for point lookups.

``fileskip`` prunes by per-file MIN/MAX — perfect for range predicates
over clustered layouts, useless for point lookups on high-cardinality
keys whose values span every file's range. A Bloom filter answers the
other question: "can partition P possibly contain key K?" with no
false negatives. This module builds one fixed-size bitmap per
partition value in ONE aggregation pass and probes it before a scan,
so a point lookup reads only the partitions whose filter says maybe.

Table formats keep the same structure per data file (Parquet's own
optional bloom filters, Delta's deletion-vector-adjacent indexes);
here it is explicit and warehouse-table-friendly: the index is itself
a tiny DataFrame (one row per partition) you can persist and
re-filter, exactly like the fileskip manifest — pruning stays a
DataFrame ``filter`` and only SURVIVING partition values are
collected (O(matches), never O(partitions)).

Determinism: bit positions come from ``xxhash64(key, seed_i)`` — the
same JVM hash the bucketing layout uses (merge.py:88), so index build
and probe agree byte-for-byte across runs and executors.

No reference counterpart (PostgreSQL's btree/GIN indexes own this in
the reference, src/core/db.py); this is lakehouse physical design on
Spark primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

M_BITS = 1024  # bitmap width per partition (16 longs)
K_HASHES = 5  # hash functions; fp rate ≈ (1-e^(-kn/m))^k
N_WORDS = M_BITS // 64


def _bit_positions(key: Column) -> list[Column]:
    """K deterministic bit positions for a key: xxhash64 seeded by the
    hash index (the seed rides as an extra hashed column). The key is
    normalized to STRING first — xxhash64 is TYPE-sensitive (hash of
    85L ≠ hash of 85), and a probe literal's inferred type need not
    match the indexed column's."""
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(M_BITS))
        for i in range(K_HASHES)
    ]


def build_bloom_index(
    df: DataFrame, key: str, part_col: str
) -> DataFrame:
    """One bitmap per ``part_col`` value over the keys it contains —
    built in one exploded aggregation (positions form map-side; the
    only exchange is the (partition, word) bit-OR, partial-aggregated,
    then an O(partitions) reassembly). Returns
    ``(part_col, bits array<long>[N_WORDS])``.

    At 100 TB: output is partitions × 128 bytes — index-sized. Keep it
    as a DataFrame/table and prune with ``prune_partitions``; never
    collect it whole.
    """
    pos = F.explode(F.array(*_bit_positions(F.col(key)))).alias("pos")
    bits = (
        df.select(F.col(part_col), pos)
        .select(
            part_col,
            (F.col("pos") / 64).cast("int").alias("word"),
            # shiftleft's amount parameter is literal-only in the
            # Python API; the SQL form accepts the pos column
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy(part_col, "word")
        .agg(F.bit_or("b").alias("w"))
    )
    # assemble the fixed-width bitmap, zero-filling absent words
    return (
        bits.groupBy(part_col)
        .agg(
            F.map_from_arrays(
                F.collect_list("word"), F.collect_list("w")
            ).alias("wm")
        )
        .select(
            part_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(N_WORDS - 1)),
                lambda i: F.coalesce(
                    F.element_at("wm", i.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("bits"),
        )
    )


def _probe_positions(index_df: DataFrame, value) -> list[int]:
    """The probe key's K bit positions as Python ints — one 1-row JVM
    job, so build and probe share the exact xxhash64 (a Python-side
    reimplementation would silently diverge)."""
    spark = index_df.sparkSession
    row = spark.range(1).select(*_bit_positions(F.lit(value))).first()
    return [int(p) for p in row]


def _might_contain(bits: Column, positions: list[int]) -> Column:
    """True iff every one of the key's K bits is set in ``bits`` —
    no false negatives by construction. Positions are literals, so
    each check is one element_at + constant-mask AND."""
    out = None
    for p in positions:
        word = F.element_at(bits, p // 64 + 1)
        mask = 1 << (p % 64)
        if mask >= 1 << 63:  # bit 63: wrap to the signed-long pattern
            mask -= 1 << 64
        check = word.bitwiseAND(F.lit(mask)) != 0
        out = check if out is None else out & check
    return out


def prune_partitions(index_df: DataFrame, part_col: str, value) -> list:
    """Partition values whose bloom filter says the key MAY be present
    — a DataFrame filter over the index; only survivors are collected
    (the fileskip-manifest driver-budget discipline)."""
    positions = _probe_positions(index_df, value)
    kept = index_df.filter(_might_contain(F.col("bits"), positions))
    return sorted(r[0] for r in kept.select(part_col).collect())


def prune_partitions_multi(
    index_df: DataFrame, part_col: str, values: list
) -> dict:
    """Batched probe: surviving partitions for EVERY key in ``values``
    from ONE job (per-key probing pays a driver round-trip per key —
    the latency term of a point-lookup service). The tiny key list
    broadcasts against the index; bit positions compute with the SAME
    ``_bit_positions`` expression the build uses (string-normalized
    xxhash64), word/bit extraction is JVM-side (``>> pos & 1`` — the
    arithmetic shift's sign-fill can't reach the masked lowest bit),
    and a (partition, key) survives iff all K bits are set. Returns
    ``{key_value: sorted partition list}`` with an entry for every
    requested key (empty list = bloom says impossible everywhere).

    Driver budget: one collect of O(sum of survivors), same as the
    single-key path; never O(partitions x keys)."""
    if not values:  # createDataFrame can't infer an empty list's schema
        return {}
    spark = index_df.sparkSession
    probe = spark.createDataFrame([(v,) for v in values], ["_pv"])
    pos = probe.select(
        "_pv",
        F.posexplode(F.array(*_bit_positions(F.col("_pv")))).alias(
            "_i", "pos"
        ),
    ).drop("_i")
    word = F.element_at(
        F.col("bits"), (F.col("pos") / 64).cast("int") + 1
    )
    bit = F.expr("(_w >> CAST(pos % 64 AS INT)) & 1")
    kept = (
        index_df.crossJoin(F.broadcast(pos))
        .withColumn("_w", word)
        .withColumn("_b", bit)
        .groupBy(part_col, "_pv")
        .agg(F.min("_b").alias("_all_set"))
        .filter(F.col("_all_set") == 1)
        .select(part_col, "_pv")
        .collect()
    )
    out: dict = {v: [] for v in values}
    for r in kept:
        out[r["_pv"]].append(r[part_col])
    return {v: sorted(ps) for v, ps in out.items()}


def read_point_lookup_multi(
    df: DataFrame, index_df: DataFrame, key: str, part_col: str, values: list
) -> DataFrame:
    """Multi-key point lookup through the index in TWO jobs total
    (one batched probe + the pruned scan): the scan filter is the
    UNION of every key's surviving partitions with the exact
    ``key IN values`` predicate re-applied — value-equal to per-key
    lookups (the key predicate discards rows a partition only
    contributed for a different key), reading exactly the union of
    surviving partitions."""
    parts = prune_partitions_multi(index_df, part_col, values)
    union_parts = sorted({p for ps in parts.values() for p in ps})
    if not union_parts:
        return df.filter(F.lit(False)).filter(F.col(key).isin(values))
    return df.filter(F.col(part_col).isin(union_parts)).filter(
        F.col(key).isin(values)
    )


def read_point_lookup(
    df: DataFrame, index_df: DataFrame, key: str, part_col: str, value
) -> DataFrame:
    """Point lookup through the index: prune to maybe-partitions, then
    re-apply the exact key predicate. On a layout partitioned by
    ``part_col`` the IN-filter is partition pruning at the scan — the
    pruned partitions' files are never opened."""
    parts = prune_partitions(index_df, part_col, value)
    if not parts:
        # bloom says impossible everywhere: provably-empty result
        return df.filter(F.lit(False)).filter(F.col(key) == value)
    return df.filter(F.col(part_col).isin(parts)).filter(
        F.col(key) == value
    )


def refresh_bloom_index(
    warehouse,
    table: str,
    key: str,
    index_table: str | None = None,
    touched: list | None = None,
) -> str:
    """MAINTAINED index: (re)build the bloom bitmaps for ``table``
    keyed on its warehouse bucket column, as a warehouse table of its
    own. With ``touched`` (the bucket list a merge just wrote — the
    same list ``apply_changes``/``merge_upsert`` derive), only those
    partitions' bitmaps recompute and every other index row carries
    over: index maintenance is O(touched buckets), matching the
    merge's own write cost. Bloom bits only ADD under upserts, so a
    stale untouched bitmap is impossible — deletes make bits stale
    only toward false POSITIVES (more partitions read, never wrong
    results), reconciled at the next full refresh, the same contract
    Parquet's own file blooms have under row-group rewrites.

    Returns the committed index version path.
    """
    from qms_datawarehouse_spark.warehouse import (
        BUCKET_COL,
        ConcurrentWriteError,
    )

    index_table = index_table or f"{table}__bloom"
    # CAS against the index version the carry-over was computed from:
    # two concurrent incremental refreshes would otherwise each carry
    # the OTHER's touched buckets from the stale base, committing an
    # index missing fresh bits — a silent false NEGATIVE, the one
    # thing a bloom filter must never produce. Same retry discipline
    # as vacuum_tombstones / apply_changes.
    if touched is None or not warehouse.table_exists(index_table):
        # full rebuild: self-contained (no carry-over), no CAS needed
        return warehouse.write_version(
            index_table, build_bloom_index(warehouse.read(table), key, BUCKET_COL)
        )
    zeros = F.array_repeat(F.lit(0).cast("long"), N_WORDS)
    last_exc: Exception | None = None
    for _ in range(3):
        base = warehouse.current_version_name(index_table)
        # main-table snapshot read INSIDE the loop, after the base
        # index version: a CAS retry means a concurrent merge+refresh
        # committed under us, and rebuilding the touched buckets from
        # a pre-merge snapshot would drop that merge's keys — the
        # silent false negative the CAS exists to prevent.
        df = warehouse.read(table)
        fresh = build_bloom_index(
            df.filter(F.col(BUCKET_COL).isin(list(touched))),
            key,
            BUCKET_COL,
        ).withColumnRenamed("bits", "_fresh_bits")
        prior = warehouse.read(index_table, version=base)
        carried = prior.filter(~F.col(BUCKET_COL).isin(list(touched)))
        # belt-and-braces: bit-OR the base index's TOUCHED bitmaps into
        # the fresh ones. Bloom bits are monotone under upserts (deletes
        # only go stale toward false positives, reconciled at full
        # rebuild), so OR-ing the prior bits can never lose a key even
        # if the main snapshot somehow predates a concurrent commit —
        # incremental refresh is immune to interleaving by algebra, not
        # just by retry ordering.
        prior_touched = prior.filter(
            F.col(BUCKET_COL).isin(list(touched))
        ).select(BUCKET_COL, F.col("bits").alias("_prior_bits"))
        merged = (
            fresh.join(prior_touched, on=BUCKET_COL, how="full_outer")
            .select(
                BUCKET_COL,
                F.zip_with(
                    F.coalesce(F.col("_fresh_bits"), zeros),
                    F.coalesce(F.col("_prior_bits"), zeros),
                    lambda a, b: a.bitwiseOR(b),
                ).alias("bits"),
            )
        )
        try:
            return warehouse.write_version(
                index_table,
                carried.unionByName(merged),
                expect_base=base,
            )
        except ConcurrentWriteError as exc:
            last_exc = exc
    raise last_exc


def warehouse_point_lookup(
    warehouse, table: str, key: str, value, index_table: str | None = None
):
    """Point lookup through the maintained index: prune to
    maybe-buckets via the index table, then filter the main table —
    on the bucket-partitioned layout the IN-filter is partition
    pruning at the scan."""
    from qms_datawarehouse_spark.warehouse import BUCKET_COL

    index_table = index_table or f"{table}__bloom"
    idx = warehouse.read(index_table)
    df = warehouse.read(table)
    return read_point_lookup(df, idx, key, BUCKET_COL, value)


# --------------------------------------------------------------------
# Driver-verifiable query: index-routed point lookups value-equal to
# the plain filter (the no-false-negative contract, checked end-to-end
# against the DuckDB oracle's direct WHERE ... IN lookup)
# --------------------------------------------------------------------

_LOOKUP_PARTS = 64  # partitions the index routes between

_BLOOM_LOOKUP_SQL = """
    WITH kk AS (
        SELECT min(o_orderkey) AS k FROM orders
        UNION
        SELECT max(o_orderkey) FROM orders
        UNION
        SELECT max(o_orderkey) FROM orders
        WHERE o_orderkey * 2 <= (SELECT max(o_orderkey) FROM orders)
    )
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey IN (SELECT k FROM kk)
    ORDER BY o_orderkey
"""


@query("bloom_index_point_lookup", _BLOOM_LOOKUP_SQL)
def bloom_index_point_lookup(spark, sf_dir: str) -> DataFrame:
    """Point lookups routed through the maintained Bloom partition
    index, value-equal to the plain key filter (the oracle): build
    one bitmap per hash partition of ``orders`` in a single
    aggregation pass, then look up min / interior / max / one
    ABSENT ``o_orderkey`` — each probe prunes to maybe-partitions
    before the exact predicate re-applies, and the absent key's
    all-partitions-say-no path returns a provably empty frame.

    Scale shape: the index is partitions × 128 B (never collected
    whole — ``prune_partitions`` filters it and collects only
    survivors); each lookup scans only surviving partitions of the
    fact. Reference analog: PostgreSQL's btree point lookups
    (src/core/db.py:28-32) — here re-expressed as lakehouse partition
    pruning on Spark primitives."""
    (orders,) = tables(spark, sf_dir, "orders")
    df = orders.withColumn(
        "_part",
        F.pmod(
            F.xxhash64(F.col("o_custkey").cast("string")),
            F.lit(_LOOKUP_PARTS),
        ).cast("int"),
    )
    idx = build_bloom_index(df, "o_orderkey", "_part").persist()
    row = df.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    lo, hi = int(row["lo"]), int(row["hi"])
    # degenerate key domains (no key with 2k <= max) return a NULL
    # aggregate — fall back to lo rather than TypeError on int(None)
    mid_val = (
        df.filter(F.col("o_orderkey") * 2 <= hi)
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    mid = lo if mid_val is None else int(mid_val)
    keys = sorted({lo, mid, hi}) + [hi + 1]  # hi+1 is absent
    # batched probe: every key's surviving partitions from ONE job
    # (read_point_lookup per key costs a driver round-trip per key —
    # the latency term this index exists to cut)
    out = read_point_lookup_multi(df, idx, "o_orderkey", "_part", keys)
    idx.unpersist()
    return (
        out.select(
            "o_orderkey",
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("total_cents"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy("o_orderkey")
    )
