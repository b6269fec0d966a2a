"""Bloom partition index: no false negatives ever, measured pruning,
and point lookups equal to the unindexed filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from qms_datawarehouse_spark.sources.bloomindex import (
    build_bloom_index,
    prune_partitions,
    read_point_lookup,
)


def _orders_bucketed(spark, n_buckets=16):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return orders.withColumn(
        "bkt", F.pmod(F.xxhash64("o_custkey"), F.lit(n_buckets))
    )


def test_no_false_negatives(spark):
    """EVERY present key's true partition must survive pruning — the
    bloom guarantee, checked exhaustively over a sample of keys."""
    df = _orders_bucketed(spark)
    idx = build_bloom_index(df, "o_custkey", "bkt").cache()
    sample = df.select("o_custkey", "bkt").distinct().limit(50).collect()
    assert sample
    for r in sample:
        assert r.bkt in prune_partitions(idx, "bkt", r.o_custkey)


def test_pruning_happens_and_lookup_is_exact(spark):
    df = _orders_bucketed(spark).cache()
    idx = build_bloom_index(df, "o_custkey", "bkt").cache()
    n_parts = idx.count()
    keys = [r.o_custkey for r in df.select("o_custkey").distinct().limit(10).collect()]
    pruned_total = 0
    for k in keys:
        parts = prune_partitions(idx, "bkt", k)
        pruned_total += n_parts - len(parts)
        got = sorted(
            r.o_orderkey
            for r in read_point_lookup(df, idx, "o_custkey", "bkt", k)
            .select("o_orderkey")
            .collect()
        )
        want = sorted(
            r.o_orderkey
            for r in df.filter(F.col("o_custkey") == k)
            .select("o_orderkey")
            .collect()
        )
        assert got == want and want
    # membership pruning must actually prune: with a hash-bucketed key
    # each key lives in exactly ONE bucket, so on average most of the
    # other 15 buckets' filters reject it
    assert pruned_total > len(keys) * 8


def test_absent_key_prunes_everywhere_or_reads_empty(spark):
    df = _orders_bucketed(spark)
    idx = build_bloom_index(df, "o_custkey", "bkt")
    # keys far outside the custkey domain
    for k in (10**12 + 7, -999983):
        assert (
            read_point_lookup(df, idx, "o_custkey", "bkt", k).count() == 0
        )


def test_spark_native_runtime_bloom_filter_join(spark):
    """Engine-level sibling of the explicit index: with runtime bloom
    filters enabled, a selective dim side injects a bloom_filter_agg
    whose might_contain probe prunes the fact scan BEFORE the shuffle
    join — Spark's own semi-join reduction. Pinned so the session
    config keeps the capability alive and results stay exact."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # local fixtures are far below the 10 GB default threshold
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        # the injected filter must not change results
        n = j.count()
        want = (
            li.join(
                orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey
            ).count()
        )
        assert n == want > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_index_maintains_incrementally_with_merge(spark, tmp_path):
    """The maintained-index lifecycle: build once, merge a batch, then
    refresh ONLY the touched buckets — lookups through the refreshed
    index see the new keys (no false negatives after maintenance) and
    untouched bitmaps carry over unchanged."""
    from qms_datawarehouse_spark.operators.merge import merge_upsert
    from qms_datawarehouse_spark.sources.bloomindex import (
        refresh_bloom_index,
        warehouse_point_lookup,
    )
    from qms_datawarehouse_spark.warehouse import BUCKET_COL, ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(200)], "_id string, v string"
    )
    merge_upsert(wh, "t", base, key="_id", n_buckets=8)
    refresh_bloom_index(wh, "t", "_id")
    before = {
        r[BUCKET_COL]: tuple(r.bits) for r in wh.read("t__bloom").collect()
    }

    batch = spark.createDataFrame(
        [("new-9001", "x"), ("new-9002", "y")], "_id string, v string"
    )
    merge_upsert(wh, "t", batch, key="_id", n_buckets=8)
    touched = sorted(
        {
            r[BUCKET_COL]
            for r in wh.read("t")
            .filter(F.col("_id").isin("new-9001", "new-9002"))
            .select(BUCKET_COL)
            .collect()
        }
    )
    refresh_bloom_index(wh, "t", "_id", touched=touched)
    after = {
        r[BUCKET_COL]: tuple(r.bits) for r in wh.read("t__bloom").collect()
    }
    for b, bits in before.items():
        if b not in touched:
            assert after[b] == bits  # untouched bitmaps carried over

    for k in ("new-9001", "new-9002", "0", "137"):
        got = warehouse_point_lookup(wh, "t", "_id", k).count()
        assert got == 1, k
    assert warehouse_point_lookup(wh, "t", "_id", "absent-key").count() == 0


def test_incremental_refresh_retries_on_concurrent_commit(spark, tmp_path):
    """The carry-over CAS: if another refresh commits between the base
    read and the swap, the write must fail, re-read the NEW base, and
    retry — a stale carry-over would reintroduce the false negatives
    the index exists to prevent."""
    from qms_datawarehouse_spark.operators.merge import merge_upsert
    from qms_datawarehouse_spark.sources.bloomindex import (
        refresh_bloom_index,
        warehouse_point_lookup,
    )
    from qms_datawarehouse_spark.warehouse import (
        ConcurrentWriteError,
        ParquetWarehouse,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(str(i), "v") for i in range(100)], "_id string, v string"
    )
    merge_upsert(wh, "t", base, key="_id", n_buckets=4)
    refresh_bloom_index(wh, "t", "_id")

    merge_upsert(
        wh, "t",
        spark.createDataFrame([("race-key", "x")], "_id string, v string"),
        key="_id", n_buckets=4,
    )
    real = wh.write_version
    calls = {"n": 0}

    def flaky(table, df, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ConcurrentWriteError("simulated interleaved commit")
        return real(table, df, *a, **kw)

    wh.write_version = flaky
    try:
        refresh_bloom_index(wh, "t", "_id", touched=[0, 1, 2, 3])
    finally:
        wh.write_version = real
    assert calls["n"] == 2  # failed once, retried with a fresh base
    assert warehouse_point_lookup(wh, "t", "_id", "race-key").count() == 1


def test_retry_sees_concurrent_merge_in_overlapping_bucket(spark, tmp_path):
    """The r4-advice race: a concurrent merge+refresh lands between the
    base read and the CAS failure, touching a bucket the outer refresh
    also rebuilds. The retry must rebuild from a main-table snapshot
    that includes the concurrent merge's keys (and bit-OR the prior
    bitmaps) — a stale-snapshot rebuild would commit an index missing
    the key, the silent false negative the CAS claims to prevent."""
    from qms_datawarehouse_spark.operators.merge import merge_upsert
    from qms_datawarehouse_spark.sources.bloomindex import (
        refresh_bloom_index,
        warehouse_point_lookup,
    )
    from qms_datawarehouse_spark.warehouse import (
        BUCKET_COL,
        ConcurrentWriteError,
        ParquetWarehouse,
    )

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    merge_upsert(
        wh, "t",
        spark.createDataFrame(
            [(str(i), "v") for i in range(100)], "_id string, v string"
        ),
        key="_id", n_buckets=4,
    )
    refresh_bloom_index(wh, "t", "_id")
    merge_upsert(
        wh, "t",
        spark.createDataFrame([("race-key", "x")], "_id string, v string"),
        key="_id", n_buckets=4,
    )

    real = wh.write_version
    state = {"fired": False}

    def flaky(table, df, *a, **kw):
        if not state["fired"]:
            state["fired"] = True
            # interleave a REAL concurrent merge + incremental refresh
            # (with the real write_version) before failing the CAS —
            # every bucket overlaps the outer refresh's touched set
            wh.write_version = real
            merge_upsert(
                wh, "t",
                spark.createDataFrame(
                    [("concurrent-key", "z")], "_id string, v string"
                ),
                key="_id", n_buckets=4,
            )
            bkt = [
                r[BUCKET_COL]
                for r in wh.read("t")
                .filter(F.col("_id") == "concurrent-key")
                .select(BUCKET_COL)
                .collect()
            ]
            refresh_bloom_index(wh, "t", "_id", touched=bkt)
            raise ConcurrentWriteError("interleaved merge+refresh")
        return real(table, df, *a, **kw)

    wh.write_version = flaky
    try:
        refresh_bloom_index(wh, "t", "_id", touched=[0, 1, 2, 3])
    finally:
        wh.write_version = real
    assert state["fired"]
    # both the outer refresh's key and the concurrently merged key must
    # survive the committed index — no false negatives under interleaving
    for k in ("race-key", "concurrent-key", "0", "57"):
        assert warehouse_point_lookup(wh, "t", "_id", k).count() == 1, k
    assert warehouse_point_lookup(wh, "t", "_id", "absent").count() == 0


def test_registered_lookup_query_matches_plain_filter(spark):
    """The driver-window query routes through the index; its rows must
    equal the plain key filter (no-false-negative contract), and the
    probes must actually PRUNE — surviving partitions << total."""
    from qms_datawarehouse_spark.sources.bloomindex import (
        _LOOKUP_PARTS,
        bloom_index_point_lookup,
        build_bloom_index,
        prune_partitions,
    )

    out = bloom_index_point_lookup(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    mid = (
        orders.filter(F.col("o_orderkey") * 2 <= hi)
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    expect = sorted(
        r.o_orderkey
        for r in orders.filter(
            F.col("o_orderkey").isin([int(lo), int(mid), int(hi)])
        ).collect()
    )
    assert [r.o_orderkey for r in out] == expect

    # pruning evidence: a present key's bloom probe keeps a small
    # fraction of the partitions (exact given the data — xxhash64 is
    # deterministic; at SF_DIR's key density fp-rate is tiny)
    df = orders.withColumn(
        "_part",
        F.pmod(
            F.xxhash64(F.col("o_custkey").cast("string")),
            F.lit(_LOOKUP_PARTS),
        ).cast("int"),
    )
    idx = build_bloom_index(df, "o_orderkey", "_part")
    kept = prune_partitions(idx, "_part", int(lo))
    assert 1 <= len(kept) < _LOOKUP_PARTS // 2


def test_multi_key_probe_matches_per_key(spark):
    """The batched probe (one job for all keys) must return exactly
    the per-key prune results, and the multi-lookup frame must equal
    the union of single-key lookups."""
    from qms_datawarehouse_spark.sources.bloomindex import (
        build_bloom_index,
        prune_partitions,
        prune_partitions_multi,
        read_point_lookup,
        read_point_lookup_multi,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = orders.withColumn(
        "_part",
        F.pmod(F.xxhash64(F.col("o_custkey").cast("string")), F.lit(32)).cast(
            "int"
        ),
    )
    idx = build_bloom_index(df, "o_orderkey", "_part").persist()
    lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    keys = [int(lo), int(lo) + 7, int(hi), int(hi) + 1]  # last is absent

    multi = prune_partitions_multi(idx, "_part", keys)
    assert set(multi) == set(keys)
    for k in keys:
        assert multi[k] == prune_partitions(idx, "_part", k), k
    assert multi[int(hi) + 1] == []  # absent key: impossible everywhere

    got = sorted(
        tuple(r)
        for r in read_point_lookup_multi(
            df, idx, "o_orderkey", "_part", keys
        ).collect()
    )
    want = sorted(
        tuple(r)
        for k in keys
        for r in read_point_lookup(df, idx, "o_orderkey", "_part", k).collect()
    )
    assert got == want
    idx.unpersist()
