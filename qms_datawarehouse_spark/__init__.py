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

__all__ = ["Settings", "get_spark"]
__version__ = "0.1.0"
