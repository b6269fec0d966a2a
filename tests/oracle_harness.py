"""Local replica of the driver's DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` SQL side-by-side on the same parquet tables and
compares: row count, sorted column names, and an order-insensitive
value multiset (floats rounded to 6 significant-ish decimals,
timestamps/dates normalized to ISO strings).

Two comparison paths run per query:

1. **Exact path** — ``collect()`` vs ``fetchall()``: exact Python
   values, the strictest value equality available.
2. **Pandas path** — ``toPandas()`` vs DuckDB ``.df()``: the
   DRIVER's actual canonicalization route. This is where dtype
   coercion bites: DuckDB returns ``sum(BIGINT)`` as HUGEINT, which
   ``.df()`` converts to float64 (lossy above 2^53 and — decisive
   for the driver's hash — a different dtype than Spark's exact
   int64 even below it). CORRECTNESS_r02 failed four queries this
   way while the fetchall path passed locally, so the pandas path
   now FAILS any query whose aggregate dtypes diverge in kind
   (int-family vs float) between the two engines.

Stricter-is-safer: if this passes, the driver's hash compare should
too — which is why query outputs avoid raw floats/timestamps where
possible (rounded/ formatted columns aliased identically on both
sides).

Usage: ``python tests/oracle_harness.py [sf_dir] [query ...]``
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # absorb engine-order ulp differences in float aggregation
        return f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _norm_value(v.item())
    except ImportError:
        pass
    return v


def _rows_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(_norm_value(row[i]) for i in order) for row in rows)


def _pandas_norm_value(v):
    """Normalize a pandas cell for the driver-path multiset.

    Midnight timestamps normalize to the bare date: DuckDB ``.df()``
    widens DATE to datetime64 while Spark's ``toPandas`` keeps
    ``datetime.date`` objects — the driver's canonicalizer tolerates
    that pairing (DATE-returning queries are driver-green), so the
    harness must too.
    """
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "null"
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0) and (v.tzinfo is None):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    return _norm_value(v)


def _pandas_multiset(pdf):
    cols = sorted(pdf.columns)
    return Counter(
        tuple(_pandas_norm_value(row[c]) for c in cols)
        for _, row in pdf.iterrows()
    )


_NUMERIC_KINDS = {"i": "int", "u": "int", "f": "float"}


def compare_pandas_path(sdf, con, sql):
    """The driver's route: Spark ``toPandas()`` vs DuckDB ``.df()``.

    Fails on (a) numeric dtype-KIND divergence per column — e.g.
    Spark int64 vs DuckDB float64-from-HUGEINT, which hash-mismatch
    at the driver even when every value is exactly representable —
    and (b) value-multiset divergence after pandas coercion.
    """
    spark_pdf = sdf.toPandas()
    duck_pdf = con.execute(sql).df()

    problems = []
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        sk = _NUMERIC_KINDS.get(spark_pdf[c].dtype.kind)
        dk = _NUMERIC_KINDS.get(duck_pdf[c].dtype.kind)
        if sk and dk and sk != dk:
            problems.append(
                f"pandas dtype coercion on {c!r}: spark={spark_pdf[c].dtype}"
                f" duck={duck_pdf[c].dtype} — driver hashes these differently"
                " (DuckDB HUGEINT/DECIMAL -> float64? cast the oracle"
                " aggregate to BIGINT)"
            )
    if not problems:
        ms, md = _pandas_multiset(spark_pdf), _pandas_multiset(duck_pdf)
        if ms != md:
            only_s = list((ms - md).items())[:3]
            only_d = list((md - ms).items())[:3]
            problems.append(
                f"pandas-path values differ; spark-only={only_s} duck-only={only_d}"
            )
    return problems


def compare_one(spark, con, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    if not problems:
        ms, md = _rows_multiset(spark_cols, spark_rows), _rows_multiset(duck_cols, duck_rows)
        if ms != md:
            only_s = list((ms - md).items())[:3]
            only_d = list((md - ms).items())[:3]
            problems.append(f"values differ; spark-only={only_s} duck-only={only_d}")
    if not problems:
        problems = compare_pandas_path(sdf, con, sql)
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark("oracle-harness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed, passed, skipped = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            # rows-only check (driver's weaker path)
            n = fn(spark, sf_dir).count()
            print(f"  ~ {name}: rows-only ({n} rows)")
            skipped.append(name)
            continue
        try:
            problems = compare_one(spark, con, name, fn, sql, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"exception: {type(exc).__name__}: {exc}"]
        if problems:
            failed.append(name)
            print(f"  ✗ {name}")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"  ✓ {name}")

    print(
        f"\n{len(passed)} matched, {len(failed)} failed, {len(skipped)} rows-only "
        f"(sf_dir={sf_dir})"
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
