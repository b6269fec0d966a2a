"""T8 observability: metrics + structured logs, Spark-first.

Reference surface: Prometheus instrumentation on the API
(/root/reference/src/main.py:9,108), Redis task-status hashes
(src/api/routes.py:21-29), structured JSON logs
(src/core/logger.py:20-27). The Spark-side equivalents:

- ``MetricsRegistry`` — in-process counters/gauges with label sets,
  the scrape surface a Prometheus exporter (or any agent) would read;
  ``snapshot_df`` exposes it as a DataFrame so the warehouse's own
  query stack can serve the dashboard.
- ``observe_rows`` — the Spark ``Observation`` API: named metrics
  (row count, null count, min/max) collected AS the plan executes, so
  data-quality telemetry costs zero extra scans (the reference counts
  rows with separate queries).
- ``log_event`` — one structured JSON line per lifecycle event on the
  standard ``logging`` channel; collectors ship it as-is.

The sync engine (engine.py) publishes per-run metrics here; nothing
in the data path depends on this module (observability must never be
load-bearing).
"""

from __future__ import annotations

import json
import logging
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger("qms_datawarehouse_spark")


def _labelkey(labels: dict[str, str] | None) -> tuple:
    return tuple(sorted((labels or {}).items()))


@dataclass
class MetricsRegistry:
    """Thread-safe counters and gauges with label sets."""

    counters: dict = field(default_factory=dict)
    gauges: dict = field(default_factory=dict)

    def __post_init__(self):
        self._lock = threading.Lock()

    def inc(self, name: str, labels: dict[str, str] | None = None, by: float = 1.0):
        k = (name, _labelkey(labels))
        with self._lock:
            self.counters[k] = self.counters.get(k, 0.0) + by

    def set_gauge(self, name: str, value: float, labels: dict[str, str] | None = None):
        with self._lock:
            self.gauges[(name, _labelkey(labels))] = value

    def value(self, name: str, labels: dict[str, str] | None = None) -> float | None:
        k = (name, _labelkey(labels))
        with self._lock:
            return self.counters.get(k, self.gauges.get(k))

    def snapshot(self) -> list[dict]:
        with self._lock:
            rows = [
                {"metric": n, "kind": "counter", "value": float(v),
                 "labels": json.dumps(dict(lk), sort_keys=True)}
                for (n, lk), v in self.counters.items()
            ] + [
                {"metric": n, "kind": "gauge", "value": float(v),
                 "labels": json.dumps(dict(lk), sort_keys=True)}
                for (n, lk), v in self.gauges.items()
            ]
        return sorted(rows, key=lambda r: (r["metric"], r["labels"]))

    def snapshot_df(self, spark: SparkSession) -> DataFrame:
        """The scrape endpoint as a DataFrame (metric, kind, labels,
        value) — queryable by the same SQL front door as everything
        else."""
        return spark.createDataFrame(
            self.snapshot() or [{"metric": "", "kind": "", "value": 0.0, "labels": "{}"}],
            "metric string, kind string, value double, labels string",
        ).filter(F.col("metric") != "")


#: process-wide default registry (the reference's module-level
#: Instrumentator is the same shape)
METRICS = MetricsRegistry()


def observe_rows(df: DataFrame, name: str, *null_check_cols: str):
    """Attach zero-cost plan metrics: total rows plus per-column null
    counts for ``null_check_cols``. Returns ``(df, observation)`` —
    read ``observation.get`` AFTER an action has run the plan.

    This is the Spark-native version of the reference's per-batch
    counts (dump.py logs fetched/inserted counts with extra queries):
    the metrics ride the SAME job, no second scan.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_check_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    return df.observe(obs, *metrics), obs


def log_event(event: str, **fields) -> str:
    """One structured JSON log line (reference src/core/logger.py:
    JSON-formatted records). Returns the serialized line (also sent to
    the library logger)."""
    line = json.dumps(
        {"event": event, "ts": time.time(), **fields},
        sort_keys=True,
        default=str,
    )
    logger.info(line)
    return line


class TaskStatusStore:
    """S14 task-status hashes (reference src/api/routes.py:21-29:
    ``redis_client.hset(task_id, source_uri, status)``): per-task
    field→status maps with the same hset/hget/hgetall/expire surface.

    ``expire(task_id, ttl)`` mirrors routes.py:93 (``expire(task_id,
    3600)``): the whole hash lapses ``ttl`` seconds later. Expiry is
    enforced lazily on access plus an explicit ``sweep()`` — the same
    observable semantics as Redis's background eviction without a
    reaper thread. ``clock`` is injectable for tests.

    In-memory by default — a Redis deployment swaps in by subclassing
    with the redis client's own methods, nothing else changes (the
    seam is the four methods, not this class)."""

    DEFAULT_TTL_SEC = 3600  # reference routes.py:93

    def __init__(self, clock=time.monotonic):
        self._h: dict[str, dict[str, str]] = {}
        self._deadline: dict[str, float] = {}
        self._clock = clock
        self._lock = threading.Lock()

    def _evict_if_expired(self, task_id: str) -> None:
        dl = self._deadline.get(task_id)
        if dl is not None and self._clock() >= dl:
            self._h.pop(task_id, None)
            self._deadline.pop(task_id, None)

    def hset(self, task_id: str, field: str, value: str) -> None:
        with self._lock:
            self._evict_if_expired(task_id)
            self._h.setdefault(task_id, {})[field] = value

    def hget(self, task_id: str, field: str) -> str | None:
        with self._lock:
            self._evict_if_expired(task_id)
            return self._h.get(task_id, {}).get(field)

    def hgetall(self, task_id: str) -> dict[str, str]:
        with self._lock:
            self._evict_if_expired(task_id)
            return dict(self._h.get(task_id, {}))

    def expire(self, task_id: str, ttl_sec: float = DEFAULT_TTL_SEC) -> bool:
        """Arm (or re-arm) the task's TTL. Returns False when the task
        id holds no fields (Redis EXPIRE on a missing key)."""
        with self._lock:
            self._evict_if_expired(task_id)
            if task_id not in self._h:
                return False
            self._deadline[task_id] = self._clock() + ttl_sec
            return True

    def ttl(self, task_id: str) -> float | None:
        """Seconds until expiry, or None when no TTL is armed."""
        with self._lock:
            self._evict_if_expired(task_id)
            dl = self._deadline.get(task_id)
            return None if dl is None else max(0.0, dl - self._clock())

    def sweep(self) -> int:
        """Evict every lapsed task now; returns the count evicted."""
        with self._lock:
            lapsed = [
                t for t, dl in self._deadline.items() if self._clock() >= dl
            ]
            for t in lapsed:
                self._h.pop(t, None)
                self._deadline.pop(t, None)
            return len(lapsed)


#: process-wide default status store
STATUS = TaskStatusStore()


def run_tracked(task_id: str, source: str, fn, status: TaskStatusStore | None = None):
    """The reference's background-task lifecycle (routes.py:18-28):
    mark running → run → mark ``success: <result>`` or
    ``failed: <error>``; failures re-raise after being recorded. The
    terminal status arms the task's TTL (routes.py:93 ``expire(
    task_id, 3600)``) so finished task hashes lapse instead of
    accreting forever."""
    store = status or STATUS
    store.hset(task_id, source, "running")
    try:
        result = fn()
        store.hset(task_id, source, f"success: {result}")
        return result
    except Exception as exc:
        store.hset(task_id, source, f"failed: {exc!s}"[:500])
        raise
    finally:
        store.expire(task_id)


def record_sync_metrics(
    registry: MetricsRegistry,
    source: str,
    collection: str,
    status: str,
    records: int,
    duration_sec: float,
) -> None:
    """Publish one sync run's outcome (the reference's
    sync-counter/last-duration surface)."""
    labels = {"source": source, "collection": collection}
    registry.inc("sync_runs_total", {**labels, "status": status})
    registry.inc("sync_records_total", labels, by=float(records))
    registry.set_gauge("last_sync_records", float(records), labels)
    registry.set_gauge("last_sync_duration_sec", float(duration_sec), labels)
    registry.set_gauge("last_sync_unixtime", time.time(), labels)
