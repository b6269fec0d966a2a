"""Leaf module: the deterministic md5 hash bucket and the 90/5/5
split boundaries, shared by curation (sampling/splitting) and dedup
(the split-leakage audit and its by-cluster remedy).

Lives OUTSIDE the registry import graph on purpose: modules that
register queries (curation, dedup, …) are re-entered partially
initialized during the package's circular-import window, so any
constant one of them needs from another AT MODULE-EXEC TIME must come
from a leaf like this one (same pattern as ``lsh_planes``).

md5 first-8-hex-digits as an integer is uniform and identical in
Spark (``conv`` hex→dec) and DuckDB (``'0x…'::UBIGINT``); both see
the same bytes because the key is cast to its decimal string first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Hash-range boundaries in basis points: 90 / 5 / 5.
SPLIT_VAL_BP = 9000
SPLIT_TEST_BP = 9500


def hash_bp(key: Column) -> Column:
    """Uniform [0, 10000) bucket from a key — Spark side."""
    h = F.md5(key.cast("string").cast("binary")).substr(1, 8)
    return F.conv(h, 16, 10).cast("long") % 10000


def _sql_hash_bp(key_expr: str) -> str:
    """Same uniform bucket — DuckDB side. BIGINT, not UBIGINT: the
    driver hashes pandas values, and uint64 vs int64 dtypes diverge."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::UBIGINT"
        f" % 10000 AS BIGINT)"
    )


def hash_u32(key: Column) -> Column:
    """md5-first-8-hex-digits as a BIGINT (uniform 32-bit value) —
    Spark side. ``hash_bp`` is this modulo 10⁴; the sketch family
    (KMV, Count-Min, bottom-k) and the A/B splitter consume the raw
    32-bit form. ONE audited implementation of the cross-engine
    identity — edits here and in ``_sql_hash_u32`` must stay paired."""
    h = F.md5(key.cast("string").cast("binary")).substr(1, 8)
    return F.conv(h, 16, 10).cast("long")


def _sql_hash_u32(key_expr: str) -> str:
    """Same uniform 32-bit value — DuckDB side (BIGINT, not UBIGINT:
    the driver hashes pandas values and uint64 vs int64 diverge)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::UBIGINT AS BIGINT)"
    )
