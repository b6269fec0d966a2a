"""``sqlitedb`` — a relational-database connector on Spark 4's Python
Data Source API, proving the SourceSpec/SinkSpec seam against a real
second system with no network and no extra jars (stdlib ``sqlite3``).

Parity: the reference's relational hop (/root/reference/src/core/
db.py:28-32 engine-per-request; dump.py:22-31 batched
``to_sql``/insert): rows move between the engine and an external SQL
database through a declarative spec. The mongo connector seam
(``sources/connectors.py``) stays classpath-gated in this image; this
connector exercises the exact same resolution path end-to-end.

Architecture (the shapes a production JDBC read has):

- **partitioned scan**: ``partitions()`` computes ``min(rowid)`` /
  ``max(rowid)`` once on the driver (index metadata, not a table
  scan) and splits into ``numPartitions`` contiguous rowid ranges;
  each executor opens the database file itself and reads ONLY its
  range — the classic partitionColumn/lowerBound/upperBound JDBC
  fan-out, so a 10⁹-row table scans in parallel instead of through
  one cursor.
- **filter pushdown** (Spark 4.1 ``pushFilters``): comparison
  predicates become parameterized SQL ``WHERE`` clauses evaluated by
  the database — the connector-level analog of the Mongo connector
  translating Catalyst filters to ``$match``, and what keeps an
  incremental sync O(delta) at the source (S1/P1).
- **schema from the catalog**: column types read from
  ``PRAGMA table_info`` on the driver (INTEGER→bigint, REAL→double,
  BLOB→binary, else string) — no sampling scan.
- **writer**: executors batch-insert their partitions
  (``executemany``) under a generous ``busy_timeout``; SQLite
  serializes writers with a file lock, so parallel partitions
  interleave politely (a server database would take them truly
  concurrently). ``overwrite`` truncates once, driver-side, before
  any executor writes.

Register once per session, then resolve through the ordinary seam::

    register_sqlite(spark)
    df = SourceSpec("sqlitedb", options={"url": db_path,
                                         "table": "people"}).load(spark)
    SinkSpec("sqlitedb", options={"url": db_path, "table": "out"},
             mode="append").write(df)
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_TYPE_MAP = {"INTEGER": "bigint", "REAL": "double", "BLOB": "binary"}
_BUSY_TIMEOUT_MS = 30_000


def register_sqlite(spark) -> None:
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SqliteDataSource)


def _connect(url: str) -> sqlite3.Connection:
    con = sqlite3.connect(url, timeout=_BUSY_TIMEOUT_MS / 1000)
    con.execute(f"PRAGMA busy_timeout = {_BUSY_TIMEOUT_MS}")
    return con


def _table_schema(url: str, table: str) -> str:
    with _connect(url) as con:
        cols = con.execute(f"PRAGMA table_info({_q(table)})").fetchall()
    if not cols:
        raise ValueError(f"sqlite table not found: {table!r} in {url!r}")
    parts = []
    for _cid, name, decl, *_ in cols:
        decl = (decl or "").upper()
        spark_t = "string"
        for k, v in _TYPE_MAP.items():
            if k in decl:
                spark_t = v
                break
        parts.append(f"{name} {spark_t}")
    return ", ".join(parts)


def _q(ident: str) -> str:
    """Quote an identifier; reject quote characters outright (P5
    identifier safety — table names reach SQL text)."""
    if '"' in ident or "\x00" in ident:
        raise ValueError(f"invalid sqlite identifier: {ident!r}")
    return f'"{ident}"'


@dataclass
class _RowidRange(InputPartition):
    lo: int  # inclusive
    hi: int  # inclusive


class SqliteReader(DataSourceReader):
    """Rowid-range-parallel scan with WHERE-clause filter pushdown."""

    _PUSHABLE = (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
        IsNotNull,
    )
    _OPS = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }

    def __init__(self, schema: StructType, options) -> None:
        self.fields = [f.name for f in schema.fields]
        self.url = options.get("url") or options.get("path")
        self.table = options.get("table")
        if not self.url or not self.table:
            raise ValueError("sqlitedb requires options 'url' and 'table'")
        self.n_parts = int(options.get("numpartitions", 4))
        self.where: list[str] = []
        self.params: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if not (isinstance(f, self._PUSHABLE) and len(f.attribute) == 1):
                yield f  # unsupported → Spark evaluates post-scan
                continue
            col = _q(f.attribute[0])
            if isinstance(f, IsNotNull):
                self.where.append(f"{col} IS NOT NULL")
            else:
                self.where.append(f"{col} {self._OPS[type(f)]} ?")
                self.params.append(f.value)

    def partitions(self) -> list[_RowidRange]:
        with _connect(self.url) as con:
            row = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {_q(self.table)}"
            ).fetchone()
        lo, hi = row if row and row[0] is not None else (0, -1)
        if hi < lo:
            return [_RowidRange(0, -1)]  # empty table: one no-op split
        span = hi - lo + 1
        step = max(1, -(-span // self.n_parts))
        return [
            _RowidRange(s, min(s + step - 1, hi))
            for s in range(lo, hi + 1, step)
        ]

    def read(self, partition: _RowidRange) -> Iterator[Tuple]:
        if partition.hi < partition.lo:
            return
        cols = ", ".join(_q(c) for c in self.fields)
        clauses = ["rowid BETWEEN ? AND ?"] + self.where
        sql = (
            f"SELECT {cols} FROM {_q(self.table)} "
            f"WHERE {' AND '.join(clauses)}"
        )
        with _connect(self.url) as con:
            yield from con.execute(
                sql, [partition.lo, partition.hi, *self.params]
            )


@dataclass
class _InsertCommit(WriterCommitMessage):
    n_rows: int


class SqliteWriter(DataSourceWriter):
    """Executor-parallel batched inserts (reference dump.py:22-31
    insert_batches parity). The table is created/truncated ONCE on the
    driver (this constructor) before any executor task runs."""

    def __init__(self, schema: StructType, options, overwrite: bool) -> None:
        self.url = options.get("url") or options.get("path")
        self.table = options.get("table")
        if not self.url or not self.table:
            raise ValueError("sqlitedb requires options 'url' and 'table'")
        self.fields = [f.name for f in schema.fields]
        decls = ", ".join(
            f"{_q(f.name)} {self._decl(f.dataType.simpleString())}"
            for f in schema.fields
        )
        with _connect(self.url) as con:
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {_q(self.table)} ({decls})"
            )
            if overwrite:
                con.execute(f"DELETE FROM {_q(self.table)}")
            con.commit()

    @staticmethod
    def _decl(spark_type: str) -> str:
        if spark_type in ("tinyint", "smallint", "int", "bigint", "boolean"):
            return "INTEGER"
        if spark_type in ("float", "double"):
            return "REAL"
        if spark_type == "binary":
            return "BLOB"
        return "TEXT"

    def write(self, rows) -> _InsertCommit:
        cols = ", ".join(_q(c) for c in self.fields)
        marks = ", ".join("?" for _ in self.fields)
        sql = f"INSERT INTO {_q(self.table)} ({cols}) VALUES ({marks})"
        n = 0
        batch: list[tuple] = []
        con = _connect(self.url)
        try:
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= 1000:
                    con.executemany(sql, batch)
                    n += len(batch)
                    batch.clear()
            if batch:
                con.executemany(sql, batch)
                n += len(batch)
            con.commit()
        finally:
            con.close()
        return _InsertCommit(n)

    def commit(self, messages) -> None:
        pass  # inserts are per-task committed; SQLite has no staging

    def abort(self, messages) -> None:
        pass


class SqliteDataSource(DataSource):
    """The ``sqlitedb`` format, resolvable through SourceSpec/SinkSpec."""

    @classmethod
    def name(cls) -> str:
        return "sqlitedb"

    def schema(self) -> str:
        return _table_schema(
            self.options.get("url") or self.options.get("path"),
            self.options.get("table"),
        )

    def reader(self, schema: StructType) -> SqliteReader:
        return SqliteReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SqliteWriter:
        return SqliteWriter(schema, self.options, overwrite)


def sqlite_source(url: str, table: str, num_partitions: int = 4):
    """S1/S12-shaped spec for the sqlite connector (register first)."""
    from qms_datawarehouse_spark.sources.connectors import SourceSpec

    return SourceSpec(
        format="sqlitedb",
        options={
            "url": url,
            "table": table,
            "numpartitions": str(num_partitions),
        },
    )


def sqlite_sink(url: str, table: str, mode: str = "append"):
    from qms_datawarehouse_spark.sources.connectors import SinkSpec

    return SinkSpec(
        format="sqlitedb", options={"url": url, "table": table}, mode=mode
    )
