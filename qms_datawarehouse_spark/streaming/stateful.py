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
