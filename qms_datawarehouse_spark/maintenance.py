"""Nightly maintenance runbook — one idempotent entry point.

The reference leaves warehouse hygiene to Postgres (autovacuum, its
own WAL recovery); a file-based versioned warehouse has to run its
own: complete any crashed multi-table commit, sweep abandoned
stagings, consolidate merge fragmentation, and re-aggregate stale
materialized views. Each step is independently safe to re-run and
failure-isolated — one broken table must not block the others (the
same isolation stance as ``sync_all``).

Order matters and is load-bearing:

1. ``recover_transactions`` FIRST — tables must reach their journaled
   state before anything reads or rewrites them;
2. ``vacuum_orphans`` — uses the version log recovery just appended;
3. ``compact(only_fragmented=True)`` — O(fragmented buckets), skips
   clean tables entirely via the metadata-only worklist;
4. ``refresh_matview`` for every stale view — AFTER compaction so the
   refresh reads consolidated files.

Run it from the scheduler (``IntervalRunner(maintain)``) or a cron'd
``spark-submit``. At 100 TB each step stays metadata-bounded except
compaction, which is explicitly only-fragmented.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from qms_datawarehouse_spark.operators.matview import is_stale, refresh_matview
from qms_datawarehouse_spark.operators.transaction import (
    recover_transactions,
    vacuum_orphans,
)
from qms_datawarehouse_spark.warehouse import ParquetWarehouse


@dataclass
class MaintenanceReport:
    recovered_txns: int = 0
    orphans_removed: list[str] = field(default_factory=list)
    compacted: list[str] = field(default_factory=list)
    refreshed: dict[str, str] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)


def _is_matview(wh: ParquetWarehouse, table: str) -> bool:
    try:
        return "mv_base" in wh.read_meta(table)
    except Exception:  # noqa: BLE001 — no meta file ⇒ plain table
        return False


def maintain(
    wh: ParquetWarehouse,
    orphan_min_age_sec: float = 3600.0,
    compact_sort_col: str | None = None,
) -> MaintenanceReport:
    """Run the full hygiene pass; never raises for a single table's
    failure — errors are collected per step/table in the report."""
    report = MaintenanceReport()

    try:
        report.recovered_txns = len(recover_transactions(wh))
    except Exception as exc:  # noqa: BLE001
        report.errors["recover_transactions"] = str(exc)[:200]

    try:
        report.orphans_removed = vacuum_orphans(
            wh, min_age_sec=orphan_min_age_sec
        )
    except Exception as exc:  # noqa: BLE001
        report.errors["vacuum_orphans"] = str(exc)[:200]

    for table in wh.list_tables():
        if _is_matview(wh, table):
            continue
        try:
            if wh.fragmented_partitions(table):
                wh.compact(
                    table, sort_col=compact_sort_col, only_fragmented=True
                )
                report.compacted.append(table)
        except Exception as exc:  # noqa: BLE001
            report.errors[f"compact:{table}"] = str(exc)[:200]

    for table in wh.list_tables():
        if not _is_matview(wh, table):
            continue
        try:
            if is_stale(wh, table):
                report.refreshed[table] = refresh_matview(wh, table)
        except Exception as exc:  # noqa: BLE001
            report.errors[f"refresh:{table}"] = str(exc)[:200]

    return report
