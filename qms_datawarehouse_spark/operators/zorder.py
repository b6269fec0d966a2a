"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

Single-column sort gives perfect min/max file pruning on ONE column and
none on any other. Interleaving the bits of several columns' rank codes
orders rows along a space-filling curve, so every file covers a narrow
range of EVERY participating column — a filter on any of them prunes
most files by parquet footer min/max stats. This is the standard
lakehouse layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) re-expressed
with plain DataFrame ops; no reference counterpart (the reference
delegates physical layout to Postgres indexes).

Scale shape:
- Per-column quantile cut points come from ``approx_percentile`` — one
  JVM aggregate, driver receives ≤ ``2**bits`` doubles per column
  (bounded metadata, never data).
- Rank-code assignment is a fold over that small broadcast-literal
  array (``aggregate``; interpreted-lambda cost is bits·rows ≈ fine for
  a one-time load job — the hot read path never pays it).
- Bit interleave is pure codegen arithmetic (``shiftleft``/``|``).
- ``repartitionByRange(n_files, z)`` is the one shuffle (range
  exchange with a sampled boundary pass), then files are written
  z-contiguous. At 100 TB: n_files ≈ table_bytes / 512 MB; the shuffle
  is the same cost as any full-table sort and amortizes over every
  subsequent pruned read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_code(col: Column, cuts: list[float], bits: int) -> Column:
    """Map a value to its quantile bucket in [0, 2**bits) by counting
    how many cut points it exceeds (fold over a small literal array)."""
    cuts_arr = F.array(*[F.lit(float(c)) for c in cuts])
    counted = F.aggregate(
        cuts_arr,
        F.lit(0),
        lambda acc, c: acc + F.when(col > c, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.least(counted, F.lit(2**bits - 1))


def _interleave(codes: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide codes: bit b of column i lands at
    position b*len(codes)+i. Pure integer codegen, no UDF."""
    n = len(codes)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit.cast("long"), b * n + i))
    return z


def _as_double(df: DataFrame, c: str) -> Column:
    """Numeric view of a column; timestamps (tz or ntz) become epoch
    micros so they order and bucket like any other number."""
    dtype = dict(df.dtypes)[c]
    col = F.col(c)
    if dtype.startswith("timestamp"):
        col = F.unix_micros(col.cast("timestamp"))
    elif dtype == "date":
        col = F.datediff(col, F.lit("1970-01-01"))
    return col.cast("double")


def zorder_code(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """The z-value column for ``cols`` (numeric/timestamp/date), using
    per-column ``approx_percentile`` cut points from ``df`` itself."""
    num_cols = [_as_double(df, c) for c in cols]
    pcts = F.array(*[F.lit(i / (2**bits)) for i in range(1, 2**bits)])
    cuts_row = df.select(
        *[
            F.percentile_approx(nc, pcts, F.lit(10000)).alias(f"c{i}")
            for i, nc in enumerate(num_cols)
        ]
    ).first()
    codes = [
        _rank_code(nc, list(cuts_row[i]), bits)
        for i, nc in enumerate(num_cols)
    ]
    return _interleave(codes, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files laid out along the
    z-curve of ``cols``: range-partition then sort within partitions on
    the z-value (dropped before write), so each file's footer min/max
    covers a narrow slice of every z-ordered column."""
    z = zorder_code(df, cols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
