"""JSON → warehouse bulk importer — the reference's dump.py CLI
(/root/reference/dump.py:162-247) collapsed onto the engine.

Per collection=file pair: sniff format (array vs NDJSON, dump.py:34-45),
stream-read with per-record error skip (dump.py:71-77,125-143),
destructive reload (delete-then-import, dump.py:187-194 → overwrite
version), then verify the landed count (dump.py:227). The reference's
1000-doc insert batching and unordered parallel inserts are Spark's
partitioned write — free.

Usage:
    python tools/import_json.py --warehouse /path/wh ticket=t.ndjson user=u.json
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main(argv: list[str] | None = None) -> int:
    from qms_datawarehouse_spark.session import get_spark
    from qms_datawarehouse_spark.sources.readers import (
        corrupt_count,
        detect_json_format,
        read_json_auto,
        valid_records,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True, help="warehouse root dir")
    ap.add_argument(
        "pairs", nargs="+", metavar="TABLE=FILE", help="table=json_file pairs"
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("import-json", master=args.master)
    wh = ParquetWarehouse(spark, args.warehouse)

    status = 0
    for pair in args.pairs:
        table, _, path = pair.partition("=")
        if not path:
            print(f"SKIP {pair}: expected TABLE=FILE", file=sys.stderr)
            status = 2
            continue
        fmt = detect_json_format(path)
        df = read_json_auto(spark, path)
        good = valid_records(df)
        n_bad = corrupt_count(df)
        wh.write_version(table, good)  # destructive reload (D2)
        n = wh.read(table).count()  # post-load verification (A4)
        print(f"{table}: imported {n} records from {path} ({fmt}), "
              f"skipped {n_bad} malformed")
    return status


if __name__ == "__main__":
    raise SystemExit(main())
