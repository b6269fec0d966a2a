"""Change-feed → warehouse CDC applier CLI.

Reads a sequenced change feed (parquet or NDJSON with ``_id``,
``_seq``, ``_op`` ∈ {upsert, delete} + payload columns) and applies it
to a warehouse table through ``operators.cdc.apply_changes`` —
highest-seq-wins per key, delete tombstones suppressing late
pre-delete upserts, main + tombstone versions committed atomically.
The delete-capable counterpart to tools/import_json.py's
destructive-reload and the sync engine's upsert-only merge.

Usage:
    python tools/apply_cdc.py --warehouse /path/wh --table docs feed.parquet
    python tools/apply_cdc.py --warehouse /path/wh --table docs \
        --vacuum-below 1700000000 changes.ndjson
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main(argv: list[str] | None = None) -> int:
    from qms_datawarehouse_spark.operators.cdc import (
        apply_changes,
        vacuum_tombstones,
    )
    from qms_datawarehouse_spark.session import get_spark
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True, help="warehouse root dir")
    ap.add_argument("--table", required=True, help="target table")
    ap.add_argument("feed", help="change-feed file (parquet or NDJSON)")
    ap.add_argument("--key", default="_id")
    ap.add_argument("--seq-col", default="_seq")
    ap.add_argument("--op-col", default="_op")
    ap.add_argument(
        "--vacuum-below", type=int, default=None, metavar="SEQ",
        help="after applying, drop tombstones with seq below this horizon",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("apply-cdc", master=args.master)
    wh = ParquetWarehouse(spark, args.warehouse)

    if args.feed.endswith(".parquet"):
        feed = spark.read.parquet(args.feed)
    else:
        # same ingestion path as tools/import_json.py: array-vs-NDJSON
        # sniffing, malformed lines skipped AND reported (a corrupt
        # line read naively becomes a null-op row, which the operator
        # rejects loudly — better to skip + count it here)
        from qms_datawarehouse_spark.sources.readers import (
            corrupt_count,
            read_json_auto,
            valid_records,
        )

        raw = read_json_auto(spark, args.feed)
        n_bad = corrupt_count(raw)
        if n_bad:
            print(f"skipped {n_bad} malformed feed lines")
        feed = valid_records(raw)

    stats = apply_changes(
        wh, args.table, feed,
        key=args.key, seq_col=args.seq_col, op_col=args.op_col,
    )
    print(
        f"applied {args.table}: {stats.n_changes} keyed changes — "
        f"{stats.n_upserts} upserts, {stats.n_deletes} deletes, "
        f"{stats.n_suppressed} suppressed (late pre-delete)"
    )
    if args.vacuum_below is not None:
        n = vacuum_tombstones(wh, args.table, args.vacuum_below)
        print(f"vacuumed {n} tombstones below seq {args.vacuum_below}")
    # an empty or deletes-only first feed legitimately leaves no table
    n_rows = wh.read(args.table).count() if wh.table_exists(args.table) else 0
    print(f"{args.table}: {n_rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
