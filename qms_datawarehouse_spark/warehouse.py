"""Parquet-backed warehouse tables with atomic version swap.

The reference's warehouse is Postgres: staging table + one set-based
``INSERT ... ON CONFLICT DO UPDATE`` per batch
(/root/reference/src/services/etl.py:26-87). On plain parquet (no
transactional table format in this image) the equivalent durability
story is **write-new-version-then-repoint**:

    {root}/{table}/v_{uuid}/...parquet     (immutable version dirs)
    {root}/{table}/_CURRENT                (text file naming the live one)

``_CURRENT`` is replaced with ``os.replace`` (atomic on POSIX), so a
reader always resolves a fully-written version — the parity of the
reference's transactional apply + temp-table drop (etl.py:52-87).

Scale design: data tables are hash-bucketed on the merge key into
``_bucket=pmod(xxhash64(key), n_buckets)`` partition directories. A
merge then touches ONLY the buckets that contain updated keys (see
``operators/merge.py``) — at 100 TB with n_buckets≈8192, a 5k-row
incremental batch rewrites a handful of buckets, not the table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

CURRENT_POINTER = "_CURRENT"
BUCKET_COL = "_bucket"


class ParquetWarehouse:
    """Versioned parquet table store rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------

    def table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _pointer_path(self, table: str) -> str:
        return os.path.join(self.table_dir(table), CURRENT_POINTER)

    def current_version_dir(self, table: str) -> str | None:
        ptr = self._pointer_path(table)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            version = f.read().strip()
        path = os.path.join(self.table_dir(table), version)
        return path if os.path.exists(path) else None

    # -- catalog -------------------------------------------------------

    def table_exists(self, table: str) -> bool:
        """P3 existence predicate (parity: inspector.has_table,
        src/services/etl.py:32-33)."""
        return self.current_version_dir(table) is not None

    def list_tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.exists(os.path.join(self.root, d, CURRENT_POINTER))
        )

    # -- read ----------------------------------------------------------

    def read(self, table: str) -> DataFrame:
        path = self.current_version_dir(table)
        if path is None:
            raise FileNotFoundError(f"warehouse table not found: {table}")
        return self.spark.read.parquet(path)

    # -- write ---------------------------------------------------------

    def write_version(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        keep_versions: int = 2,
    ) -> str:
        """Write ``df`` as a fresh immutable version and atomically
        repoint ``_CURRENT`` at it. Returns the version dir.

        ``keep_versions`` old versions are retained for concurrent
        readers mid-scan, then garbage-collected (the reference drops
        its temp staging table at etl.py:87; here old versions are the
        staging residue).
        """
        tdir = self.table_dir(table)
        os.makedirs(tdir, exist_ok=True)
        version = f"v_{uuid.uuid4().hex[:12]}"
        vdir = os.path.join(tdir, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)

        tmp_ptr = self._pointer_path(table) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp_ptr, "w") as f:
            f.write(version)
        os.replace(tmp_ptr, self._pointer_path(table))  # atomic repoint

        self._gc_versions(table, keep=keep_versions)
        return vdir

    def _gc_versions(self, table: str, keep: int) -> None:
        tdir = self.table_dir(table)
        current = os.path.basename(self.current_version_dir(table) or "")
        versions = sorted(
            (d for d in os.listdir(tdir) if d.startswith("v_") and d != current),
            key=lambda d: os.path.getmtime(os.path.join(tdir, d)),
        )
        for d in versions[: max(0, len(versions) - keep)]:
            shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)

    def drop(self, table: str) -> None:
        """D2 destructive reload (parity: delete_many({}),
        dump.py:187-194)."""
        shutil.rmtree(self.table_dir(table), ignore_errors=True)

    def write_time_partitioned(
        self,
        table: str,
        df: DataFrame,
        ts_col: str,
        grain: str = "day",
    ) -> str:
        """Write a time-series table partitioned by event date —
        the layout for append-mostly fact tables (events, tickets).

        Date-range predicates then prune whole partition directories
        (PartitionFilters in the scan, asserted in
        tests/test_plans_scale.py) — at 100 TB a one-day query reads
        1/retention of the table before any row is touched. Combine
        with bucket-partitioning only when a table needs BOTH keyed
        merges and time pruning (partitionBy(date, bucket)).
        """
        from pyspark.sql import functions as F

        part = {"day": F.to_date(ts_col), "month": F.date_trunc("month", ts_col)}[
            grain
        ].cast("date")
        return self.write_version(
            table,
            df.withColumn("_event_date", part),
            partition_by=["_event_date"],
        )

    # -- maintenance ---------------------------------------------------

    def compact(
        self,
        table: str,
        sort_col: str | None = None,
        files_per_partition: int = 1,
    ) -> str:
        """Rewrite the current version with consolidated files.

        Frequent small incremental merges accrete small files — the
        classic streaming-warehouse pathology (at 100 TB, scan cost is
        dominated by file-open overhead once files are ≪ the parquet
        row-group size). Compaction rewrites each bucket partition
        into ``files_per_partition`` files; with ``sort_col`` set,
        rows are sorted within files so parquet min/max stats give
        point lookups row-group skipping (poor-man's clustering).
        Readers are never blocked: this is just another atomic
        version swap.
        """
        df = self.read(table)
        parted = BUCKET_COL in df.columns
        if parted:
            df = df.repartition(files_per_partition, BUCKET_COL)
        else:
            df = df.coalesce(files_per_partition)
        if sort_col is not None:
            cols = ([BUCKET_COL] if parted else []) + [sort_col]
            df = df.sortWithinPartitions(*cols)
        return self.write_version(
            table, df, partition_by=[BUCKET_COL] if parted else None
        )
