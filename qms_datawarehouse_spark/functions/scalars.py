"""Scalar column functions (SURVEY §2.7).

All JVM-side built-in expressions — no Python UDFs. Each maps a
reference behavior:

- ``duration_m_s``: renders seconds as ``"Xm Ys"`` — the staff-report
  time-to-serve format (F10; /root/reference — staff_reports.json:13-15
  shows e.g. "14m 52s").
- ``sorted_set_str``: deterministic rendering of a collected distinct
  set (A8 ``companyNames``) — sorted + comma-joined so results are
  order-insensitive-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duration_m_s(seconds: Column) -> Column:
    """``seconds`` (integral) → ``"Xm Ys"`` string (F10).

    floor-division semantics; deterministic for non-negative input.
    """
    sec = seconds.cast("long")
    # floor() (not cast) so semantics match SQL floor()::BIGINT in the
    # DuckDB oracle — double→long CAST rounds in DuckDB but truncates
    # in Spark.
    return F.concat(
        F.floor(sec / 60).cast("string"),
        F.lit("m "),
        (sec % 60).cast("string"),
        F.lit("s"),
    )


def sorted_set_str(col: Column) -> Column:
    """collect_set → sorted, comma-joined string (A8, deterministic)."""
    return F.array_join(F.array_sort(F.collect_set(col)), ",")
