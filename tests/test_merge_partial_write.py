"""Incremental merges must NOT rewrite the whole table.

Pins the O(touched-bucket) contract: after a small merge, every
untouched bucket's parquet files in the new version are the SAME
inodes as in the previous version (hardlink-inherited, zero bytes
copied), while touched buckets are fresh files. Also pins the
persisted-n_buckets validation and schema evolution across inherited
files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.merge import merge_upsert
from qms_datawarehouse_spark.warehouse import BUCKET_COL, ParquetWarehouse

N_BUCKETS = 8


def _inodes_by_bucket(vdir: str) -> dict[str, set[int]]:
    out: dict[str, set[int]] = {}
    for entry in os.listdir(vdir):
        if not entry.startswith(f"{BUCKET_COL}="):
            continue
        files = [
            os.path.join(vdir, entry, f)
            for f in os.listdir(os.path.join(vdir, entry))
            if f.endswith(".parquet")
        ]
        out[entry] = {os.stat(p).st_ino for p in files}
    return out


@pytest.fixture()
def warehouse(spark, tmp_path):
    return ParquetWarehouse(spark, str(tmp_path / "wh"))


def _seed(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("_id"),
        F.lit(1).alias("updated_at"),
        F.lit("v1").alias("payload"),
    )


def test_untouched_buckets_are_hardlink_inherited(spark, warehouse):
    merge_upsert(warehouse, "t", _seed(spark), key="_id", n_buckets=N_BUCKETS)
    v1 = warehouse.current_version_dir("t")
    before = _inodes_by_bucket(v1)
    assert len(before) == N_BUCKETS  # 200 keys cover all 8 buckets

    # one-key update → exactly one touched bucket
    upd = spark.createDataFrame(
        [(7, 2, "v2")], "_id long, updated_at int, payload string"
    )
    merge_upsert(warehouse, "t", upd, key="_id")
    v2 = warehouse.current_version_dir("t")
    assert v2 != v1
    after = _inodes_by_bucket(v2)

    from qms_datawarehouse_spark.operators.merge import with_bucket

    touched = f"{BUCKET_COL}=" + str(
        with_bucket(upd, "_id", N_BUCKETS).select(BUCKET_COL).first()[0]
    )
    for bucket, inodes in after.items():
        if bucket == touched:
            assert inodes.isdisjoint(before[bucket]), "touched bucket must be rewritten"
        else:
            assert inodes == before[bucket], f"{bucket} was rewritten, not inherited"

    # and the merge is still correct
    rows = {r["_id"]: r["payload"] for r in warehouse.read("t").collect()}
    assert rows[7] == "v2" and rows[8] == "v1" and len(rows) == 200


def test_n_buckets_is_persisted_and_validated(spark, warehouse):
    merge_upsert(warehouse, "t", _seed(spark), key="_id", n_buckets=N_BUCKETS)
    assert warehouse.read_meta("t")["n_buckets"] == N_BUCKETS

    upd = spark.createDataFrame([(1, 2, "x")], "_id long, updated_at int, payload string")
    with pytest.raises(ValueError, match="n_buckets"):
        merge_upsert(warehouse, "t", upd, key="_id", n_buckets=N_BUCKETS * 2)

    # omitting n_buckets adopts the persisted value — no strand, no dup
    merge_upsert(warehouse, "t", upd, key="_id")
    assert warehouse.read("t").filter(F.col("_id") == 1).count() == 1


def test_schema_evolution_across_inherited_files(spark, warehouse):
    merge_upsert(warehouse, "t", _seed(spark), key="_id", n_buckets=N_BUCKETS)
    upd = spark.createDataFrame(
        [(7, 2, "v2", "extra!")],
        "_id long, updated_at int, payload string, note string",
    )
    merge_upsert(warehouse, "t", upd, key="_id")
    out = warehouse.read("t")
    assert "note" in out.columns
    vals = {r["_id"]: r["note"] for r in out.filter(F.col("_id").isin(7, 8)).collect()}
    # updated row carries the new column; inherited rows null-fill it
    assert vals == {7: "extra!", 8: None}


def test_invalid_table_names_rejected(spark, warehouse):
    for bad in ["../evil", "a/b", "", ".", "a b", "x;drop"]:
        with pytest.raises(ValueError):
            warehouse.table_dir(bad)


def test_partial_compaction_touches_only_fragmented_buckets(spark, warehouse):
    """only_fragmented compaction rewrites multi-file buckets into unit
    files and hardlink-inherits already-unit buckets."""
    # the write path now clusters rows by bucket before partitioned
    # writes, so commits land ~one file per dir and small fixtures
    # can't fragment organically (at scale, AQE skew-splits and
    # maxRecordsPerFile still can) — manufacture the fragmentation:
    # split two bucket dirs' unit files into two row-disjoint halves
    # each, same rows, fragmented layout
    import os

    merge_upsert(warehouse, "t", _seed(spark), key="_id", n_buckets=N_BUCKETS)
    upd = spark.createDataFrame(
        [(7, 2, "v2")], "_id long, updated_at int, payload string"
    )
    merge_upsert(warehouse, "t", upd, key="_id")

    vdir = warehouse.current_version_dir("t")
    for bucket_val in (0, 1):
        bdir = os.path.join(vdir, f"{BUCKET_COL}={bucket_val}")
        rows = spark.read.parquet(bdir).cache()
        rows.count()
        half = rows.filter(F.col("_id") % 2 == 0)
        rest = rows.filter(F.col("_id") % 2 != 0)
        for fn in os.listdir(bdir):
            if fn.endswith(".parquet"):
                os.remove(os.path.join(bdir, fn))
        for i, part in enumerate((half, rest)):
            tmp = os.path.join(vdir, f"_frag{bucket_val}_{i}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            for fn in os.listdir(tmp):
                if fn.endswith(".parquet"):
                    os.rename(
                        os.path.join(tmp, fn),
                        os.path.join(bdir, f"part-frag-{i}.parquet"),
                    )
            import shutil as _sh

            _sh.rmtree(tmp, ignore_errors=True)
        rows.unpersist()

    before = _inodes_by_bucket(vdir)
    frag = warehouse.fragmented_partitions("t")
    assert frag and len(frag) < N_BUCKETS, "need a mix to test partial compaction"

    out = warehouse.compact("t", sort_col="_id", only_fragmented=True)
    assert out != vdir
    after = _inodes_by_bucket(out)
    for bucket, inodes in after.items():
        key = bucket.split("=")[1]
        if key in frag:
            assert len(inodes) == 1, "fragmented bucket not consolidated"
        else:
            assert inodes == before[bucket], f"{bucket} rewritten needlessly"
    # contents intact
    rows = {r["_id"]: r["payload"] for r in warehouse.read("t").collect()}
    assert len(rows) == 200 and rows[7] == "v2"

    # idempotent: nothing fragmented → same version returned
    assert warehouse.compact("t", only_fragmented=True) == out


def test_partial_write_refuses_unpartitioned_previous_version(spark, warehouse):
    """Inheriting from a version with no partition dirs would silently
    drop every untouched row — must fail loudly instead."""
    warehouse.write_version("t", spark.range(5).toDF("x"))  # unpartitioned
    with pytest.raises(ValueError, match="partition dirs"):
        warehouse.write_version_partial(
            "t", spark.range(1).toDF("x").withColumn(BUCKET_COL, F.lit(0)), [0]
        )


def test_stats_fold_exact_counts_hwm_and_touched(spark, warehouse):
    """The per-commit driver actions were folded into ONE per-bucket
    aggregate (count + cursor max per bucket; touched = group keys).
    Pin the derived stats against the old three-action semantics:
    rows merged counts the DEDUPED batch, the high-water mark is the
    global cursor max across buckets, an all-NULL cursor batch yields
    hwm None, and an empty batch is a (0, None) no-op that creates no
    table."""
    from qms_datawarehouse_spark.operators.merge import merge_upsert_stats

    empty = spark.createDataFrame(
        [], "`_id` string, updated_at timestamp, v long"
    )
    assert merge_upsert_stats(warehouse, "t_fold", empty) == (0, None)
    assert not warehouse.table_exists("t_fold")

    batch = spark.createDataFrame(
        [
            ("a", "2024-01-02", 1),
            ("a", "2024-01-03", 2),  # same key — dedup keeps newest
            ("b", "2024-01-01", 3),
            ("c", None, 4),
        ],
        "`_id` string, updated_at string, v long",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    n, hwm = merge_upsert_stats(warehouse, "t_fold", batch, n_buckets=N_BUCKETS)
    assert n == 3  # a (deduped), b, c
    assert hwm is not None and hwm.isoformat().startswith("2024-01-03")

    nulls = spark.createDataFrame(
        [("d", None, 5), ("e", None, 6)],
        "`_id` string, updated_at string, v long",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    n, hwm = merge_upsert_stats(warehouse, "t_fold", nulls)
    assert (n, hwm) == (2, None)  # max over all-NULL cursor is None

    # the merged table state matches the last-write-wins expectation
    rows = {
        (r["_id"], r["v"])
        for r in warehouse.read("t_fold").select("_id", "v").collect()
    }
    assert rows == {("a", 2), ("b", 3), ("c", 4), ("d", 5), ("e", 6)}
