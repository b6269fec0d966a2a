"""Append-only sync audit log (``sync_history``).

Parity: /root/reference/src/core/db.py:56-67 (schema) and
/root/reference/src/services/etl.py:153-179 (start/success/failed
rows). Appends go to a dedicated append-dir (parquet append mode is
safe: new files only); the recent-runs view is the reference's
``ORDER BY started_at DESC LIMIT n`` (S9,
/root/reference/src/api/routes.py:114-126).
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qms_datawarehouse_spark.warehouse import ParquetWarehouse

TABLE = "sync_history"

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("collection", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("records_synced", T.IntegerType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)


def _append_dir(warehouse: ParquetWarehouse) -> str:
    return os.path.join(warehouse.root, TABLE + "_log")


def record(
    warehouse: ParquetWarehouse,
    source: str,
    collection: str,
    status: str,
    started_at: dt.datetime,
    completed_at: dt.datetime | None = None,
    records_synced: int = 0,
    message: str | None = None,
) -> str:
    """Append one audit row; returns its UUID id (F9 parity:
    uuid4 history ids, etl.py:189)."""
    hist_id = str(uuid.uuid4())
    row = warehouse.spark.createDataFrame(
        [
            (
                hist_id,
                source,
                collection,
                status,
                started_at,
                completed_at,
                records_synced,
                message,
            )
        ],
        schema=SCHEMA,
    )
    row.write.mode("append").parquet(_append_dir(warehouse))
    return hist_id


def read_history(warehouse: ParquetWarehouse) -> DataFrame:
    path = _append_dir(warehouse)
    if not os.path.exists(path):
        return warehouse.spark.createDataFrame([], schema=SCHEMA)
    return warehouse.spark.read.schema(SCHEMA).parquet(path)


def recent(warehouse: ParquetWarehouse, limit: int = 50) -> DataFrame:
    """S9: sort desc + LIMIT (parity: routes.py:120-121). Spark plans
    this as TakeOrderedAndProject — a top-K, not a full sort."""
    return read_history(warehouse).orderBy(F.desc("started_at")).limit(limit)
