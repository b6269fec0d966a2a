"""qms_datawarehouse_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``ErbetoMiheretab/qms_datawarehouse`` (a MongoDB→Postgres streaming
warehouse sync service), re-expressed Spark-first:

- batch + incremental ingestion of semi-structured documents
  (``sources``),
- schema-normalizing transforms (``transform``),
- exactly-once-effective keyed upsert into warehouse tables with
  checkpoint / high-water-mark resume and audit history
  (``operators.merge``, ``operators.checkpoint``, ``operators.history``,
  ``engine``),
- the analytic query library the QMS data implies (``plans``),
- Structured Streaming variants (``streaming``),
- large-scale training-data-pipeline operators: dedup, similarity
  search, text analysis, multimodal plumbing (``operators.*``).

Everything is DataFrame/SQL-first: logical plans are declared with the
PySpark DataFrame API and Catalyst/Tungsten pick the physical strategy.
"""

from qms_datawarehouse_spark.config import Settings
from qms_datawarehouse_spark.session import get_spark


def __getattr__(name: str):
    """Lazy top-level API (avoids importing the full query library —
    and with it a SparkSession dependency chain — on bare import)."""
    lazy = {
        "ParquetWarehouse": ("qms_datawarehouse_spark.warehouse", "ParquetWarehouse"),
        "sync_dataframe": ("qms_datawarehouse_spark.engine", "sync_dataframe"),
        "sync_all": ("qms_datawarehouse_spark.engine", "sync_all"),
        "merge_upsert": ("qms_datawarehouse_spark.operators.merge", "merge_upsert"),
        "clean_records": ("qms_datawarehouse_spark.transform", "clean_records"),
        "queries_map": ("qms_datawarehouse_spark.plans", "queries_map"),
        "oracle_sql_map": ("qms_datawarehouse_spark.plans", "oracle_sql_map"),
        "register_views": (
            "qms_datawarehouse_spark.sources.readers",
            "register_views",
        ),
        "IntervalRunner": ("qms_datawarehouse_spark.scheduler", "IntervalRunner"),
        "ingest_dedup": (
            "qms_datawarehouse_spark.operators.incremental_dedup",
            "ingest_dedup",
        ),
        "table_changes": (
            "qms_datawarehouse_spark.operators.changes",
            "table_changes",
        ),
        "create_matview": (
            "qms_datawarehouse_spark.operators.matview",
            "create_matview",
        ),
        "refresh_matview": (
            "qms_datawarehouse_spark.operators.matview",
            "refresh_matview",
        ),
        "register_docstore": (
            "qms_datawarehouse_spark.sources.pyds",
            "register_docstore",
        ),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Settings",
    "get_spark",
    "ParquetWarehouse",
    "sync_dataframe",
    "sync_all",
    "merge_upsert",
    "clean_records",
    "queries_map",
    "oracle_sql_map",
    "register_views",
    "IntervalRunner",
    "ingest_dedup",
    "table_changes",
    "create_matview",
    "refresh_matview",
    "register_docstore",
]
__version__ = "0.1.0"
