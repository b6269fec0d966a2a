"""S7 HTTP-source shape (distributed fetch with injected transport)
and warehouse compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from qms_datawarehouse_spark.sources.http_source import fetch_reports, parse_reports


def test_http_source_fetch_and_parse(spark):
    users = spark.createDataFrame(
        [(f"AMINFO-{i:02d}-STAFF",) for i in range(40)], "username string"
    )
    resp = fetch_reports(users)
    rows = resp.collect()
    assert len(rows) == 40
    ok = [r for r in rows if r["status"] == 200]
    failed = [r for r in rows if r["status"] != 200]
    assert failed, "fake transport must exercise the error path"
    assert all(r["payload"] is None for r in failed)

    parsed = parse_reports(resp)
    out = parsed.collect()
    assert len(out) == len(ok)  # survivors only (scraper.py parity)
    assert all(r["room_user_name"].startswith("AMINFO-") for r in out)
    assert parsed.schema["total_tickets"].dataType.typeName() == "long"


def test_compact_consolidates_files_and_preserves_rows(spark, warehouse):
    from qms_datawarehouse_spark.operators.merge import merge_upsert

    # many tiny merges -> many small files
    for i in range(5):
        df = spark.createDataFrame(
            [{"_id": f"k{j}", "v": i} for j in range(i * 4, i * 4 + 4)]
        ).withColumn("updated_at", F.current_timestamp())
        merge_upsert(warehouse, "small", df, n_buckets=4)

    before = warehouse.read("small")
    n_before = before.count()
    vdir = warehouse.current_version_dir("small")
    files_before = len(glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True))

    warehouse.compact("small", sort_col="_id")
    after = warehouse.read("small")
    vdir2 = warehouse.current_version_dir("small")
    files_after = len(glob.glob(os.path.join(vdir2, "**", "*.parquet"), recursive=True))

    assert after.count() == n_before
    assert set(r["_id"] for r in after.collect()) == set(
        r["_id"] for r in before.collect()
    )
    assert files_after <= files_before
    assert files_after <= 4  # one file per touched bucket


def test_register_views_sql_front_door(spark):
    from qms_datawarehouse_spark.sources.readers import register_views

    from conftest import SF_DIR

    views = register_views(spark, SF_DIR)
    assert "orders" in views and "lineitem" in views
    out = spark.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    ).collect()
    assert len(out) == 5
    assert sum(r["n"] for r in out) == spark.table("orders").count()
