"""Schema-normalizing transforms (warehouse landing shape).

Reference parity — /root/reference/src/services/transform.py:20-43
(``clean_dataframe`` + ``process_cell``) and
/root/reference/src/services/etl.py:144-145 (lineage columns):

- ``_id`` (and any ObjectId-ish key) → string (F1, F2);
- nested struct / array / map values → JSON-string columns (F3) — the
  reference deliberately flattens document nesting to first-level
  columns + JSON blobs so the warehouse schema stays relational;
- lineage columns ``_source`` (literal) and ``_synced_at`` (ingest
  wall-clock UTC) appended to every row (F4, F5);
- timestamps are session-UTC (F6) — enforced by session config, see
  ``session.py``.

All of this is built-in column expressions (``cast``, ``to_json``,
``lit``, ``current_timestamp``) — JVM-side, whole-stage-codegen'd; no
Python touches the data path. The reference's per-cell Python UDF
(transform.py:33-42) disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fields the reference coerces from ObjectId to string
# (src/services/transform.py:26-27 for _id; FK ids arrive as strings
# from the connector after the same normalization).
ID_COLUMNS = ("_id",)


def flatten_nested_to_json(df: DataFrame) -> DataFrame:
    """Serialize every struct/array/map column to a JSON string column.

    Column order and struct field order are schema-driven, so the JSON
    text is deterministic (unlike Python dict iteration in the
    reference's encoder). Timestamps inside nesting render ISO-8601 via
    ``to_json`` defaults — parity with MongoJSONEncoder
    (src/services/transform.py:8-18).
    """
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.StructType, T.ArrayType, T.MapType)):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
    return out


def normalize_ids(df: DataFrame, id_columns: tuple[str, ...] = ID_COLUMNS) -> DataFrame:
    """Cast key columns to string (ObjectId → string parity, F1/F2)."""
    out = df
    for c in id_columns:
        if c in df.columns and not isinstance(df.schema[c].dataType, T.StringType):
            out = out.withColumn(c, F.col(c).cast("string"))
    return out


def with_lineage(df: DataFrame, source_name: str) -> DataFrame:
    """Append ``_source`` / ``_synced_at`` lineage columns (F4, F5).

    Parity: src/services/etl.py:144-145. ``current_timestamp()`` is
    query-constant (one value per batch), matching the reference's
    single ``datetime.now(UTC)`` per batch.
    """
    return df.withColumn("_source", F.lit(source_name)).withColumn(
        "_synced_at", F.current_timestamp()
    )


def clean_records(
    df: DataFrame,
    source_name: str | None = None,
    id_columns: tuple[str, ...] = ID_COLUMNS,
) -> DataFrame:
    """Full landing normalization: ids → string, nesting → JSON text,
    optional lineage. The Spark analog of ``clean_dataframe``
    (src/services/transform.py:20-43) + lineage
    (src/services/etl.py:144-145), as one lazy plan.
    """
    out = normalize_ids(df, id_columns)
    out = flatten_nested_to_json(out)
    if source_name is not None:
        out = with_lineage(out, source_name)
    return out
