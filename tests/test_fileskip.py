"""Footer-manifest file skipping: pruned reads match full-scan results
while opening strictly fewer files on a z-ordered layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from qms_datawarehouse_spark.operators.zorder import zorder_write
from qms_datawarehouse_spark.sources.fileskip import (
    build_file_manifest,
    prune_files,
    read_pruned,
)

N_FILES = 16


@pytest.fixture(scope="module")
def zlayout(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fileskip")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    path = str(root / "z")
    zorder_write(events, path, ["user_id", "ts"], n_files=N_FILES, bits=6)
    return path


def test_manifest_covers_all_files_with_stats(zlayout):
    manifest = build_file_manifest(zlayout, ["user_id", "ts"])
    assert len(manifest) == N_FILES
    for e in manifest:
        assert e["user_id_min"] is not None
        assert e["user_id_min"] <= e["user_id_max"]
        assert e["ts_min"] <= e["ts_max"]


def test_pruned_read_matches_full_filter(spark, zlayout):
    manifest = build_file_manifest(zlayout, ["user_id"])
    full = spark.read.parquet(zlayout)
    lo, hi = full.select(
        F.expr("approx_percentile(user_id, 0.40)"),
        F.expr("approx_percentile(user_id, 0.45)"),
    ).first()

    files, total = prune_files(manifest, "user_id", lo, hi)
    assert total == N_FILES
    assert 0 < len(files) < total  # skipping actually happened

    pruned = read_pruned(spark, manifest, "user_id", lo, hi)
    expected = full.filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
    )
    assert pruned.count() == expected.count()
    a = sorted(r.event_id for r in pruned.select("event_id").collect())
    b = sorted(r.event_id for r in expected.select("event_id").collect())
    assert a == b


def test_missing_stats_column_is_never_pruned(zlayout):
    manifest = build_file_manifest(zlayout, ["nonexistent_col"])
    files, total = prune_files(manifest, "nonexistent_col", 0, 1)
    assert len(files) == total  # conservative: keep everything


def test_distributed_manifest_matches_driver_side(spark, zlayout):
    from qms_datawarehouse_spark.sources.fileskip import (
        build_file_manifest_distributed,
    )

    driver = build_file_manifest(zlayout, ["user_id", "ts"])
    dist = build_file_manifest_distributed(spark, zlayout, ["user_id", "ts"])
    assert len(dist) == len(driver)
    for a, b in zip(driver, dist):
        assert a["file"] == b["file"]
        assert a["user_id_min"] == b["user_id_min"]
        assert a["user_id_max"] == b["user_id_max"]
        assert a["ts_min"] == b["ts_min"]
        assert a["ts_max"] == b["ts_max"]


def test_dataframe_prune_collects_only_survivors(spark, zlayout):
    """The 100 TB prune path: the overlap predicate runs as a
    DataFrame filter over the manifest and only surviving paths reach
    the driver — results identical to the driver-side prune, and the
    pruned read matches the full-scan filter."""
    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
        read_pruned_distributed,
    )

    full = spark.read.parquet(zlayout)
    lo, hi = full.select(
        F.expr("approx_percentile(user_id, 0.40)"),
        F.expr("approx_percentile(user_id, 0.45)"),
    ).first()

    mdf = file_manifest_df(spark, zlayout, ["user_id"])
    survivors = prune_files_df(mdf, "user_id", lo, hi)
    driver_files, total = prune_files(
        build_file_manifest(zlayout, ["user_id"]), "user_id", lo, hi
    )
    assert survivors == sorted(driver_files)
    assert 0 < len(survivors) < total  # skipping actually happened

    pruned = read_pruned_distributed(spark, mdf, "user_id", lo, hi)
    expected = full.filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
    a = sorted(r.event_id for r in pruned.select("event_id").collect())
    b = sorted(r.event_id for r in expected.select("event_id").collect())
    assert a == b


def test_manifest_persists_as_warehouse_table(spark, zlayout, tmp_path):
    """The 100 TB manifest lifecycle claimed in the docstrings: build
    the manifest distributed, persist it as a warehouse table, read it
    back in a fresh plan, and prune from THAT — identical survivors to
    pruning the in-memory manifest."""
    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    full = spark.read.parquet(zlayout)
    lo, hi = full.select(
        F.expr("approx_percentile(user_id, 0.40)"),
        F.expr("approx_percentile(user_id, 0.45)"),
    ).first()

    mdf = file_manifest_df(spark, zlayout, ["user_id"])
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    wh.write_version("file_manifest", mdf)
    stored = wh.read("file_manifest")
    assert prune_files_df(stored, "user_id", lo, hi) == prune_files_df(
        mdf, "user_id", lo, hi
    )
