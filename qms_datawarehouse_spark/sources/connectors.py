"""Pluggable source/sink specs — the seam external connectors slot
into.

The reference reads from MongoDB (Motor client,
/root/reference/src/core/db.py:28-32; PyMongo in dump.py:22-31) and
writes scraped reports back to a JSON file (scraper.py:69-70). In
Spark both are *formats* behind the DataSource V2 API, so the engine
needs exactly one seam: a declarative spec naming the format and its
options, resolved to ``spark.read.format(...)`` /
``df.write.format(...)`` at run time.

- ``SourceSpec("parquet"|"json"|"csv"|...)`` works out of the box.
- ``SourceSpec("mongodb", options={"connection.uri": ..,
  "database": .., "collection": ..})`` is the S1/S12 connector shape:
  it resolves through the same code path and needs only the public
  ``mongo-spark-connector`` package on the classpath
  (``--packages org.mongodb.spark:mongo-spark-connector_2.13``). This
  sandbox has no Mongo server or jar, so resolving it raises a clear
  error naming the missing piece — the SEAM is real and tested; the
  driver jar is deployment config.
- ``SourceSpec("docstore", options={"path": ..})`` resolves to the
  in-repo Python Data Source connector (``sources/pyds.py``): a
  working document-store source with shard-parallel reads,
  connector-level filter pushdown, and a polling stream reader —
  proof the seam carries a full custom connector, not just built-in
  formats (register once via ``register_docstore(spark)``).

The incremental-sync contract is format-agnostic: whatever the spec
loads, ``engine.sync_dataframe`` applies the cursor predicate
(pushed into the source scan — Mongo's connector translates Catalyst
filters into ``$match``, parquet into row-group pruning) and merges.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from qms_datawarehouse_spark.sources.readers import read_json_auto

# formats shipped inside Spark itself — anything else needs its
# connector package on the classpath (deployment config, not code)
_BUILTIN_FORMATS = {"parquet", "json", "csv", "orc", "text", "avro", "jdbc"}


@dataclass
class SourceSpec:
    """Declarative source: ``format`` + ``options`` (+ optional path).

    ``load`` resolves lazily against a live session, so specs are
    plain config — constructible anywhere, serializable, and testable
    without the external system present.
    """

    format: str
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession) -> DataFrame:
        if self.format == "json" and self.path is not None:
            # keep the sniffing + PERMISSIVE corrupt-record policy
            return read_json_auto(spark, self.path)
        reader = spark.read.format(self.format).options(**self.options)
        try:
            if self.path is not None:
                return reader.load(self.path)
            return reader.load()
        except Exception as exc:
            if self.format not in _BUILTIN_FORMATS:
                raise RuntimeError(
                    f"source format {self.format!r} is not available in this "
                    f"session — add its connector package to the classpath "
                    f"(e.g. spark.jars.packages for "
                    f"org.mongodb.spark:mongo-spark-connector)"
                ) from exc
            raise


@dataclass
class SinkSpec:
    """Declarative sink: the write-back seam (S12/S13)."""

    format: str
    path: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    mode: str = "overwrite"

    def write(self, df: DataFrame) -> None:
        writer = df.write.format(self.format).options(**self.options).mode(self.mode)
        try:
            if self.path is not None:
                writer.save(self.path)
            else:
                writer.save()
        except Exception as exc:
            if self.format not in _BUILTIN_FORMATS:
                raise RuntimeError(
                    f"sink format {self.format!r} is not available in this "
                    f"session — add its connector package to the classpath"
                ) from exc
            raise


def write_json(df: DataFrame, path: str, coalesce: int | None = 1) -> str:
    """S13 JSON file sink (reference scraper.py:69-70 writes fetched
    reports back to a JSON file). NDJSON — the splittable landing
    format this library's own readers prefer.

    ``coalesce=1`` mirrors the reference's single-file output for
    small report dumps; pass ``None`` to keep the input partitioning
    for large write-backs (one file per partition — the scale path).
    """
    out = df if coalesce is None else df.coalesce(coalesce)
    out.write.mode("overwrite").json(path)
    return path


def mongo_source(uri: str, database: str, collection: str) -> SourceSpec:
    """S1's connector spec (reference src/core/db.py:28-32): resolves
    via the public mongo-spark-connector when its package is deployed;
    filters pushed by Catalyst become $match stages server-side."""
    return SourceSpec(
        format="mongodb",
        options={
            "connection.uri": uri,
            "database": database,
            "collection": collection,
        },
    )


def mongo_sink(uri: str, database: str, collection: str) -> SinkSpec:
    """S12 batch write-back spec (reference dump.py uses PyMongo
    bulk_write; the connector's save does ordered bulk upserts)."""
    return SinkSpec(
        format="mongodb",
        options={
            "connection.uri": uri,
            "database": database,
            "collection": collection,
        },
        mode="append",
    )


def parquet_source(path: str) -> SourceSpec:
    return SourceSpec(format="parquet", path=path)


def json_source(path: str) -> SourceSpec:
    return SourceSpec(format="json", path=path)
