"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps no cross-batch computational state (its only state
is the sync_metadata high-water mark, SURVEY §2.8 T2); this module adds
the custom-stateful surface a streaming warehouse needs: arbitrary
per-key state that survives micro-batch boundaries, beyond what
built-in windowed aggregation expresses.

``running_user_totals`` is the demonstrator: per-user lifetime event
count / value total / last-seen timestamp, updated each micro-batch and
emitted in ``update`` mode. The same skeleton (state schema + pandas
update function + timeout conf) carries any custom operator — decayed
counters, anomaly trackers, cross-event pattern matchers.

Scale shape: state is partitioned by the grouping key across the state
store (RocksDB-backed on a real cluster), each task sees only its keys'
state, and the pandas function receives Arrow-batched groups — no
driver involvement, no global state."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from qms_datawarehouse_spark.streaming.sync import EVENTS_SCHEMA

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into the persistent state
    and emit the updated snapshot. Runs per key per micro-batch."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            batch_max_us = int(pdf["ts"].max().value // 1_000)
            last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts_us": [last_us],
        }
    )


def running_user_totals(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType = EVENTS_SCHEMA,
) -> DataFrame:
    """Streaming per-user running totals with explicit cross-batch
    state. Emits one updated row per active user per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): typed state primitives
# --------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_distinct_types", T.LongType()),
    ]
)


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class DistinctTypeTotals(StatefulProcessor):
    """Per-user lifetime event count + distinct event-type count on
    the ``transformWithStateInPandas`` API (Spark 4's successor to
    applyInPandasWithState): instead of ONE pickled state blob per
    key, state decomposes into typed primitives — a ValueState
    counter and a MapState keyed by event_type — which the (RocksDB)
    state store reads and writes individually. A high-cardinality
    per-key map no longer round-trips wholesale every batch; only the
    touched entries do, which is what makes per-key collection state
    viable at scale. TTL and event-time timers hang off the same
    handle (unused here; the skeleton is the point)."""

    def init(self, handle) -> None:
        self.total = handle.getValueState("total", "n BIGINT")
        self.by_type = handle.getMapState(
            "by_type", "event_type STRING", "n BIGINT"
        )

    def handleInputRows(self, key, rows, timer_values):
        n = self.total.get()[0] if self.total.exists() else 0
        for pdf in rows:
            n += len(pdf)
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self.by_type.getValue((etype,))[0]
                    if self.by_type.containsKey((etype,))
                    else 0
                )
                self.by_type.updateValue((etype,), (prev + int(cnt),))
        self.total.update((n,))
        n_types = sum(1 for _ in self.by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_distinct_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def distinct_type_totals(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType = EVENTS_SCHEMA,
) -> DataFrame:
    """Streaming per-user totals with typed decomposed state
    (ValueState + MapState). Requires the RocksDB state store
    provider (set here; it is the store this API targets)."""
    # The transformWithState wire protocol is protobuf-based; fail
    # loudly with the actionable dependency instead of a worker crash
    # mid-query (this image ships no protobuf).
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf) — unavailable in this environment"
        ) from exc
    proc = DistinctTypeTotals()
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
