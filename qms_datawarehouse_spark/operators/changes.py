"""Change data feed over the warehouse's retained versions.

The reference's audit story stops at ``sync_history`` row counts
(src/services/etl.py:241-253); here the versioned layout already
retains full immutable snapshots (time travel), so the row-level diff
between any two retained versions is a join away — what changed, not
just how much. This is the feed a downstream consumer (cache
invalidation, search indexing, CDC export) actually wants after a
sync.

Scale shape: one full-outer join keyed on the merge key. Both sides
are bucket-partitioned by the SAME key layout (the merge wrote them),
so at 100 TB the join is co-partitioned; with version manifests the
diff can skip bucket dirs whose files are hardlink-identical (same
inode ⇒ provably unchanged) and join only buckets that differ —
O(changed buckets), mirroring the merge's own cost envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qms_datawarehouse_spark.warehouse import BUCKET_COL, ParquetWarehouse


def changed_partitions(
    warehouse: ParquetWarehouse,
    table: str,
    from_version: str,
    to_version: str | None = None,
    partition_col: str = BUCKET_COL,
) -> list[str] | None:
    """Partition VALUES that differ between two versions, decided from
    filesystem metadata alone: a partition dir is provably unchanged
    iff both versions hold the same file names backed by the same
    inodes (partial writes hardlink-inherit untouched buckets, so
    shared inodes ⇒ byte-identical data — no file is ever rewritten
    in place). Returns None when either version lacks the partition
    layout (caller must treat everything as changed).

    This is the O(1)-per-bucket change detector that lets CDF diffs
    and materialized-view refreshes touch only what a merge touched.
    """
    import os

    old_dir = os.path.join(warehouse.table_dir(table), from_version)
    new_dir = (
        os.path.join(warehouse.table_dir(table), to_version)
        if to_version is not None
        else warehouse.current_version_dir(table)
    )
    if not (old_dir and new_dir and os.path.isdir(old_dir) and os.path.isdir(new_dir)):
        return None
    prefix = f"{partition_col}="

    def layout(d):
        out = {}
        for entry in os.listdir(d):
            if not entry.startswith(prefix):
                continue
            pdir = os.path.join(d, entry)
            if not os.path.isdir(pdir):
                continue
            out[entry[len(prefix):]] = {
                fn: os.stat(os.path.join(pdir, fn)).st_ino
                for fn in os.listdir(pdir)
                if fn.endswith(".parquet")
            }
        return out

    old_l, new_l = layout(old_dir), layout(new_dir)
    if not old_l or not new_l:
        return None  # at least one side has no partition layout
    return sorted(
        v
        for v in set(old_l) | set(new_l)
        if old_l.get(v) != new_l.get(v)
    )


def table_changes(
    warehouse: ParquetWarehouse,
    table: str,
    key: str,
    from_version: str,
    to_version: str | None = None,
) -> DataFrame:
    """Row-level diff ``from_version → to_version`` (default: current).

    Returns one row per changed key with ``_change_type`` ∈
    {insert, update, delete} and the NEW row's columns (the OLD row's
    for deletes). Unchanged rows are filtered before the result
    materializes.

    When both versions carry the bucket layout, provably-unchanged
    buckets (shared inodes — see ``changed_partitions``) are filtered
    OUT of both scan sides first, so the join reads O(changed
    buckets), mirroring the merge that produced the diff.
    """
    old = warehouse.read(table, version=from_version)
    new = (
        warehouse.read(table, version=to_version)
        if to_version is not None
        else warehouse.read(table)
    )
    changed = changed_partitions(warehouse, table, from_version, to_version)
    if changed is not None and BUCKET_COL in old.columns and BUCKET_COL in new.columns:
        vals = [int(v) for v in changed] if changed else []
        old = old.filter(F.col(BUCKET_COL).isin(vals))
        new = new.filter(F.col(BUCKET_COL).isin(vals))
    # compare on the columns both versions share, minus the physical
    # bucket column; schema evolution's added columns count as changes
    # only for keys present on both sides (null ≠ value)
    shared = [
        c for c in new.columns if c in set(old.columns) and c != BUCKET_COL
    ]
    value_cols = [c for c in shared if c != key]

    def fp(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(key).alias("_k"),
            F.md5(F.to_json(F.struct(*[F.col(c) for c in value_cols]))).alias(
                "_fp"
            ),
            *[F.col(c) for c in shared],
        )

    o = fp(old)
    n = fp(new)
    joined = o.alias("o").join(
        n.alias("n"), F.col("o._k") == F.col("n._k"), "full_outer"
    )
    change = (
        F.when(F.col("o._k").isNull(), F.lit("insert"))
        .when(F.col("n._k").isNull(), F.lit("delete"))
        .when(F.col("o._fp") != F.col("n._fp"), F.lit("update"))
    )
    # pick whole-row by SIDE, not per-column coalesce: an update that
    # sets a column to NULL must surface the NEW null, not resurrect
    # the old value (coalesce did exactly that); deletes are the only
    # rows that read from the old side
    picked = [
        F.when(F.col("n._k").isNull(), F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in shared
    ]
    return (
        joined.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select("_change_type", *picked)
    )
