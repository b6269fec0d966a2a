"""Footer-stats file skipping: manifest-pruned reads over plain parquet.

Table formats (Delta/Iceberg) keep per-file column min/max in a
manifest so a selective read opens only overlapping files. Plain
parquet directories have the same statistics — in every file's FOOTER —
but Spark only exploits them per-row-group *after* scheduling a task
per file. This module lifts them into an explicit manifest:

- ``build_file_manifest``: per (file, column) min/max harvested from
  parquet footers via pyarrow — METADATA-ONLY I/O (a footer is a few
  KB; no data pages are read). Driver-side loop here because the
  fixture has dozens of files; at 100 TB-scale file counts, distribute
  the same footer read over the file list with ``spark.read`` +
  ``mapInPandas`` (each task opens only footers) and persist the
  manifest as a table — the code path per file is identical.
- ``read_pruned``: plan a read over ONLY the files whose [min, max]
  overlaps the predicate range, then re-apply the predicate for
  row-level exactness.

Pairs with the z-order layout (operators/zorder.py): the curve makes
per-file ranges narrow on every curve column, which is what makes this
manifest selective. On a ts-sorted layout the same manifest prunes ts
but nothing else.

No reference counterpart (Postgres indexes own this there); this is
lakehouse physical design on Spark primitives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def build_file_manifest(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet footers only.

    Returns ``[{"file": f, "<col>_min": v, "<col>_max": v, ...}, ...]``
    — row-group stats folded per file. Files lacking stats for a
    column get ``None`` bounds (never pruned — safe by construction).
    """
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fpath = os.path.join(path, name)
        md = pq.ParquetFile(fpath).metadata
        schema_names = md.schema.names
        entry: dict = {"file": fpath}
        for col in cols:
            try:
                ci = schema_names.index(col)
            except ValueError:
                entry[f"{col}_min"] = None
                entry[f"{col}_max"] = None
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            entry[f"{col}_min"] = min(mins) if mins else None
            entry[f"{col}_max"] = max(maxs) if maxs else None
        out.append(entry)
    return out


def prune_files(
    manifest: list[dict], col: str, lo, hi
) -> tuple[list[str], int]:
    """Files whose [min, max] for ``col`` overlaps [lo, hi] (files
    without stats are conservatively kept). Returns (files, total)."""
    keep = []
    for e in manifest:
        mn, mx = e.get(f"{col}_min"), e.get(f"{col}_max")
        if mn is None or mx is None or (mx >= lo and mn <= hi):
            keep.append(e["file"])
    return keep, len(manifest)


def read_pruned(
    spark: SparkSession,
    manifest: list[dict],
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the manifest files overlapping [lo, hi] on ``col``,
    with the exact range predicate re-applied (footer pruning is
    file-granular; the filter restores row-level semantics)."""
    from pyspark.sql import functions as F

    files, _ = prune_files(manifest, col, lo, hi)
    if not files:
        raise ValueError(
            "no files overlap the range — check column and bounds"
        )
    return (
        spark.read.parquet(*files)
        .filter((F.col(col) >= lo) & (F.col(col) <= hi))
    )
