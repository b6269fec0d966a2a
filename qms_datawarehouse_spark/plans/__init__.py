"""Query library. Importing this package registers every query into
``qms_datawarehouse_spark.plans.registry.REGISTRY`` (name → Spark
callable + DuckDB oracle SQL), which ``__spark_entry__`` exposes to
the driver."""

from qms_datawarehouse_spark.operators import (  # noqa: F401
    dedup,
    grouped_pandas,
    multimodal,
    rollup_hypertable,
    similarity,
    temporal,
    textops,
)
from qms_datawarehouse_spark.plans import advanced, analytics, relational  # noqa: F401
from qms_datawarehouse_spark.streaming import windows  # noqa: F401
from qms_datawarehouse_spark.plans.registry import REGISTRY, oracle_sql_map, queries_map

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
