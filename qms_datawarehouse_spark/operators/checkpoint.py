"""High-water-mark checkpoint store (``sync_metadata``).

Parity: /root/reference/src/core/db.py:43-50 (table: source_uri,
collection_name, last_synced_at, PK(source_uri, collection_name)) and
/root/reference/src/services/etl.py:89-126 (read + upsert).

The table is tiny (one row per source×collection), so it lives as a
single-version parquet dir with atomic swap; the upsert is the same
keyed-merge idiom the data tables use. Reads are driver-side point
lookups (S8) — a ``.first()`` on a filtered scan of a KB-scale table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from qms_datawarehouse_spark.warehouse import ParquetWarehouse

TABLE = "sync_metadata"

SCHEMA = T.StructType(
    [
        T.StructField("source_uri", T.StringType(), False),
        T.StructField("collection_name", T.StringType(), False),
        T.StructField("last_synced_at", T.TimestampType(), True),
    ]
)


def get_last_synced(
    warehouse: ParquetWarehouse, source_uri: str, collection: str
) -> dt.datetime | None:
    """S8 point lookup by composite key (parity: etl.py:89-100).

    Naive values are interpreted as UTC — the reference coerces with
    ``replace(tzinfo=UTC)`` on read (etl.py:97-99); here the session
    timezone is pinned UTC so the parquet value round-trips unchanged.
    """
    if not warehouse.table_exists(TABLE):
        return None
    row = (
        warehouse.read(TABLE)
        .filter(
            (F.col("source_uri") == source_uri)
            & (F.col("collection_name") == collection)
        )
        .select("last_synced_at")
        .first()
    )
    return row[0] if row else None


def set_last_synced(
    warehouse: ParquetWarehouse,
    source_uri: str,
    collection: str,
    ts: dt.datetime | str,
) -> None:
    """Composite-key upsert of the high-water mark (parity:
    etl.py:102-126 — same ON CONFLICT idiom as the data tables).

    Accepts an ISO-8601 string for callers whose cursor column was
    never typed (raw string sources); normalized to naive UTC, the
    same convention ``get_last_synced`` documents.
    """
    if isinstance(ts, str):
        ts = dt.datetime.fromisoformat(ts.replace("Z", "+00:00"))
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    from qms_datawarehouse_spark.warehouse import ConcurrentWriteError

    update = warehouse.spark.createDataFrame(
        [(source_uri, collection, ts)], schema=SCHEMA
    )
    # CAS + retry: concurrent syncs of DIFFERENT collections each
    # read-modify-write this one tiny table; an unchecked write would
    # drop the other sync's freshly-advanced mark.
    for _ in range(5):
        base = warehouse.current_version_name(TABLE)
        if base is None:
            try:
                warehouse.write_version(TABLE, update, expect_base=None)
                return
            except ConcurrentWriteError:
                continue  # raced the create — merge into theirs
        target = warehouse.read(TABLE)
        survivors = target.join(
            update.select("source_uri", "collection_name"),
            on=["source_uri", "collection_name"],
            how="left_anti",
        )
        try:
            warehouse.write_version(
                TABLE, survivors.unionByName(update), expect_base=base
            )
            return
        except ConcurrentWriteError:
            continue
    raise ConcurrentWriteError(
        f"checkpoint upsert for {source_uri}.{collection} kept losing "
        "the commit race"
    )
