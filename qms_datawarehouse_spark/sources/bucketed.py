"""Bucketed catalog tables: pre-shuffled layouts for shuffle-free joins.

The warehouse's versioned tables hash-bucket rows into partition
*directories* for O(touched-bucket) merges (warehouse.py). This module
covers the complementary layout: Spark **catalog bucketing**
(``bucketBy(n, key).sortBy(key)``), where the bucket id is recorded in
the table metadata and file names, so the planner knows both sides of
an equi-join on the bucket key are already hash-partitioned identically
and *skips the shuffle entirely* — the SortMergeJoin reads
``Bucketed: true`` scans with zero ``Exchange`` nodes.

This is the 100 TB answer for recurring fact-fact joins (e.g.
orders ⋈ lineitem on orderkey): pay one shuffle at load time, then
every subsequent join, groupBy, or merge on that key is co-located.
``sortBy`` additionally pre-sorts within each bucket file so the
sort-merge join's per-bucket sort is a no-op on clusters that enable
``spark.sql.legacy.bucketedTableScan.outputOrdering`` (kept off here:
the sort is cheap relative to the shuffle it already avoided, and the
flag is legacy).

Sizing guidance (docs/SCALING.md): pick ``n_buckets`` so one bucket of
the *larger* table ≈ 128–512 MB compressed (100 TB fact ⇒ ~262k is too
many files; 8–16k buckets of ~6–12 GB scanned by multiple tasks each
via parquet row-group splits is the operable range — catalog bucketing
still prunes and co-locates at file granularity while row-group splits
keep task counts high).

No reference counterpart (the reference delegates join strategy to
Postgres); this is Spark-native physical design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qms_datawarehouse_spark.warehouse import validate_table_name


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) on ``key``.

    One shuffle now; zero shuffles for every later equi-join/groupBy on
    ``key`` between tables bucketed with the SAME ``n_buckets``.
    """
    validate_table_name(name)
    writer = df.write.format("parquet").mode(mode).option("path", path)
    writer = writer.bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-``n_buckets`` catalog tables on their bucket keys.

    The result plan is a SortMergeJoin over two ``Bucketed: true``
    scans with no Exchange on either input (pinned by
    tests/test_bucketed_join.py). Broadcast is disabled via join hint
    rather than session conf so the optimization is per-plan: small
    dims elsewhere still broadcast.
    """
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
