"""``docstore`` — a document-store connector on Spark 4's Python
Data Source API.

Parity: the reference's MongoDB source (/root/reference/src/core/
db.py:28-32 Motor client; dump.py:22-31 PyMongo batch export). This
sandbox ships no Mongo server, so the connector reads a directory of
NDJSON shard files — the storage shape of a ``mongodump`` export —
but the architecture is the real connector architecture:

- **batch**: one ``InputPartition`` per shard file; executors parse
  their shard in parallel (``DataSourceReader.partitions``/``read``).
  Scan parallelism = shard count, exactly how a sharded collection
  scan fans out.
- **filter pushdown** (Spark 4.1 ``pushFilters``): comparison
  predicates on top-level fields are accepted, applied while
  scanning, and removed from Spark's post-scan filter — the
  connector-level analog of evaluating ``$gt`` inside MongoDB, which
  is what makes incremental sync O(delta) at the source (S1/P1).
- **streaming**: ``SimpleDataSourceStreamReader`` polls an
  append-only NDJSON log with a line-position offset
  (``initialOffset``/``read``/``readBetweenOffsets``) — the
  reference's polling cursor loop (T1 micro-batching, T2
  checkpoint/resume) with deterministic replay for recovery.

Rows with unparseable JSON are skipped, matching the S4/S6
corrupt-record policy of the file readers. ``updated_at`` stays an
ISO-8601 string at this layer (lexicographic order == temporal
order); ``engine.sync_dataframe`` coerces it to a typed timestamp on
merge.

Register once per session, then the source resolves through the
ordinary format seam (``SourceSpec(format="docstore")`` or
``spark.read.format("docstore")``)::

    register_docstore(spark)
    df = spark.read.format("docstore").schema(DOC_SCHEMA) \\
              .option("path", export_dir).load()
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Tuple

import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

DOC_SCHEMA = "_id string, payload string, updated_at string"


def register_docstore(spark) -> None:
    # Spark refuses a reader that implements pushFilters while Python
    # filter pushdown is off (default in 4.1) — opt in explicitly.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocStoreDataSource)


@dataclass
class _Shard(InputPartition):
    path: str


def _matches(row: dict, accepted: list[Filter]) -> bool:
    for f in accepted:
        col = f.attribute[-1]
        v = row.get(col)
        if isinstance(f, IsNotNull):
            if v is None:
                return False
            continue
        if v is None:
            return False
        if isinstance(f, EqualTo) and not v == f.value:
            return False
        if isinstance(f, GreaterThan) and not v > f.value:
            return False
        if isinstance(f, GreaterThanOrEqual) and not v >= f.value:
            return False
        if isinstance(f, LessThan) and not v < f.value:
            return False
        if isinstance(f, LessThanOrEqual) and not v <= f.value:
            return False
    return True


def _parse(line: str) -> dict | None:
    line = line.strip()
    if not line:
        return None
    try:
        doc = json.loads(line)
    except ValueError:
        return None  # corrupt-record policy: skip (S4/S6)
    return doc if isinstance(doc, dict) else None


class DocStoreReader(DataSourceReader):
    """Shard-parallel batch scan with comparison-filter pushdown."""

    _PUSHABLE = (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
        IsNotNull,
    )

    def __init__(self, schema: StructType, options) -> None:
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore requires option 'path' (export dir)")
        self.accepted: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            # only top-level fields; nested paths stay with Spark
            if isinstance(f, self._PUSHABLE) and len(f.attribute) == 1:
                self.accepted.append(f)
            else:
                yield f  # unsupported → Spark evaluates post-scan

    def partitions(self) -> list[_Shard]:
        shards = sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.endswith((".jsonl", ".ndjson"))
        )
        if not shards:
            raise ValueError(f"no shard files (*.jsonl) under {self.path!r}")
        return [_Shard(p) for p in shards]

    def read(self, partition: _Shard) -> Iterator[Tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                doc = _parse(line)
                if doc is None or not _matches(doc, self.accepted):
                    continue
                yield tuple(doc.get(f) for f in self.fields)


class DocStoreStreamReader(SimpleDataSourceStreamReader):
    """Polling-cursor stream over one append-only NDJSON log.

    Offset = {"pos": <line index>}: ``read`` returns every record
    appended since the checkpointed position and advances the offset;
    ``readBetweenOffsets`` replays a committed range byte-for-byte
    deterministically on recovery. Line positions (not timestamps)
    make replay exact even when appends share a timestamp — the
    reference's lost-equal-timestamp edge (T5) can't occur at this
    layer.
    """

    def __init__(self, schema: StructType, options) -> None:
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore stream requires option 'path' (log file)")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _lines(self) -> list[str]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, encoding="utf-8") as fh:
            return fh.readlines()

    def _rows(self, lines: list[str]) -> list[Tuple]:
        # a list, not a generator: Spark pickles the returned batch to
        # ship it from the planning worker, and generators don't pickle
        return [
            tuple(doc.get(f) for f in self.fields)
            for doc in map(_parse, lines)
            if doc is not None
        ]

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        lines = self._lines()
        return self._rows(lines[start["pos"]:]), {"pos": len(lines)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return self._rows(self._lines()[start["pos"]:end["pos"]])


@dataclass
class _ShardCommit(WriterCommitMessage):
    staged: str
    final: str


class DocStoreWriter(DataSourceWriter):
    """Batch sink (S12 parity: dump.py's PyMongo batch export, in
    reverse): each task streams its partition to a staged NDJSON
    shard; the driver's ``commit`` renames every staged shard into
    place only after ALL tasks succeeded — task-level atomicity
    without a transaction log, the same stage-then-publish shape as
    the warehouse's version swap. ``overwrite`` clears prior shards
    inside ``commit``, after the new ones are fully staged."""

    def __init__(self, schema: StructType, options, overwrite: bool) -> None:
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore write requires option 'path'")
        self.overwrite = overwrite

    def write(self, rows) -> _ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"shard-{uuid.uuid4().hex[:12]}"
        staged = os.path.join(self.path, f".{name}.staging")
        with open(staged, "w", encoding="utf-8") as fh:
            for row in rows:
                doc = {f: row[i] for i, f in enumerate(self.fields)}
                fh.write(json.dumps(doc, separators=(",", ":")) + "\n")
        return _ShardCommit(staged, os.path.join(self.path, f"{name}.jsonl"))

    def commit(self, messages) -> None:
        if self.overwrite:
            for n in os.listdir(self.path):
                if n.endswith((".jsonl", ".ndjson")):
                    os.unlink(os.path.join(self.path, n))
        for m in messages:
            os.replace(m.staged, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.unlink(m.staged)
            except OSError:
                pass


class DocStoreStreamWriter(DataSourceStreamWriter):
    """Streaming sink with per-epoch idempotent publication: tasks
    stage shards privately; ``commit(messages, batchId)`` first clears
    any files a previous attempt of the SAME epoch published, then
    renames the staged set into ``epoch-{batchId}-{i}.jsonl`` — so a
    replayed micro-batch (failure between sink commit and offset
    commit) overwrites itself instead of duplicating, the
    exactly-once-effective contract the warehouse merge gives keyed
    tables, expressed file-level for an append log."""

    def __init__(self, schema: StructType, options) -> None:
        self.fields = [f.name for f in schema.fields]
        self.path = options.get("path")
        if not self.path:
            raise ValueError("docstore stream write requires option 'path'")

    def write(self, iterator) -> _ShardCommit:
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f".stream-{uuid.uuid4().hex[:12]}.staging"
        )
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                doc = {f: row[i] for i, f in enumerate(self.fields)}
                fh.write(json.dumps(doc, separators=(",", ":")) + "\n")
        return _ShardCommit(staged, "")

    def commit(self, messages, batchId: int) -> None:
        for n in os.listdir(self.path):
            if n.startswith(f"epoch-{batchId}-"):
                os.unlink(os.path.join(self.path, n))  # replayed epoch
        for i, m in enumerate(messages):
            if m is None:
                continue
            os.replace(
                m.staged,
                os.path.join(self.path, f"epoch-{batchId}-{i}.jsonl"),
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(m.staged)
            except OSError:
                pass


class DocStoreDataSource(DataSource):
    """Format name ``docstore``; default schema matches the export's
    document shape, overridable via ``.schema(...)``."""

    @classmethod
    def name(cls) -> str:
        return "docstore"

    def schema(self) -> str:
        return self.options.get("schema", DOC_SCHEMA)

    def reader(self, schema: StructType) -> DocStoreReader:
        return DocStoreReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> DocStoreStreamReader:
        return DocStoreStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DocStoreWriter:
        return DocStoreWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DocStoreStreamWriter:
        return DocStoreStreamWriter(schema, self.options)
