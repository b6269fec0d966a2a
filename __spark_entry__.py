"""Driver contract for the PySpark engine.

``entry(spark)`` runs the flagship staff-report query (the output the
reference warehouse exists to produce — staff_reports.json analog) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose the full registered
query library (one entry per implemented operator from SURVEY.md §2
plus the large-scale pipeline operators); see
``qms_datawarehouse_spark/plans/registry.py`` for determinism rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qms_datawarehouse_spark.plans import oracle_sql_map, queries_map  # noqa: E402
from qms_datawarehouse_spark.plans.analytics import staff_report  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001; driver checks rows > 0."""
    return staff_report(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
