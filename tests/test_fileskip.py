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


def test_string_date_decimal_stats_prune_correctly(spark, tmp_path):
    """r4-advice class: stat types outside the old int/float/timestamp
    restore table. String stats must prune natively (lexicographic IS
    the string order); date and decimal stats must be restored to
    typed columns so range probes compare in the value domain."""
    from datetime import date
    from decimal import Decimal

    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
        read_pruned_distributed,
    )

    path = str(tmp_path / "mixed")
    df = spark.createDataFrame(
        [
            (f"k{i:04d}", date(2024, 1 + i // 28, 1 + i % 28),
             Decimal(i) / 100)
            for i in range(300)
        ],
        "sk string, d date, m decimal(10,2)",
    )
    # sk-sorted layout → narrow per-file sk ranges
    df.repartitionByRange(8, "sk").write.mode("overwrite").parquet(path)

    mdf = file_manifest_df(spark, path, ["sk", "d", "m"])
    # string stats restored as string type and prune correctly
    survivors = prune_files_df(mdf, "sk", "k0100", "k0140")
    n_files = mdf.count()
    assert 0 < len(survivors) < n_files
    got = read_pruned_distributed(spark, mdf, "sk", "k0100", "k0140")
    want = spark.read.parquet(path).filter(
        (F.col("sk") >= "k0100") & (F.col("sk") <= "k0140")
    )
    assert sorted(r.sk for r in got.collect()) == sorted(
        r.sk for r in want.collect()
    )
    # date and decimal stat columns came back typed, not string
    types = dict(mdf.dtypes)
    assert types["d_min"] == "date"
    assert types["m_min"] == "decimal(10,2)"
    # date stats harvested and usable; decimal stats may be NULL
    # (pyarrow can't decode FIXED_LEN_BYTE_ARRAY stats) — in which
    # case prune conservatively keeps everything
    assert mdf.filter(F.col("d_min").isNotNull()).count() == n_files
    kept_m = prune_files_df(mdf, "m", Decimal("0.10"), Decimal("0.20"))
    assert len(kept_m) >= 1


def test_unrestored_stat_type_keeps_all_files(spark, tmp_path):
    """If a stat column is still string-typed but probed with a typed
    bound (older manifest / unrestorable type), lexicographic compare
    could silently DROP overlapping files — prune must conservatively
    keep everything instead."""
    from qms_datawarehouse_spark.sources.fileskip import prune_files_df

    # simulate an un-restored manifest: numeric stats stored as strings
    mdf = spark.createDataFrame(
        [("f1", "9", "95"), ("f2", "100", "200")],
        "file string, v_min string, v_max string",
    )
    # probing with ints: "9" > "100" lexicographically — a naive filter
    # would drop f1 even though [9, 95] overlaps [10, 120]
    assert prune_files_df(mdf, "v", 10, 120) == ["f1", "f2"]
    # string-vs-string probes still prune normally
    assert prune_files_df(mdf, "v", "00", "05") == []


def test_binary_stats_are_nulled_not_mangled(spark, tmp_path):
    """Byte-array column stats would stringify as "b'...'" and compare
    garbage; the harvest must emit NULL bounds (files conservatively
    kept) for binary columns."""
    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
    )

    path = str(tmp_path / "bin")
    spark.createDataFrame(
        [(i, bytes([i % 250, 1, 2])) for i in range(100)],
        "id long, payload binary",
    ).repartition(4).write.mode("overwrite").parquet(path)

    mdf = file_manifest_df(spark, path, ["payload", "id"])
    rows = mdf.collect()
    assert all(r.payload_min is None and r.payload_max is None for r in rows)
    # NULL bounds → conservative keep of every file
    assert len(prune_files_df(mdf, "payload", "a", "b")) == len(rows)
    # the sibling typed column still harvested and pruned normally
    assert all(r.id_min is not None for r in rows)


def test_typed_stat_probed_with_string_bounds_keeps_all(spark):
    """The reverse direction of the restore guard: a TYPED (long)
    manifest column probed with STRING bounds would coerce both sides
    to double in the Spark filter — beyond 2^53 that compares
    approximately and can mis-prune. Keep-all instead."""
    from qms_datawarehouse_spark.sources.fileskip import prune_files_df

    big = (1 << 53) + 1  # not exactly representable as double
    mdf = spark.createDataFrame(
        [("f1", big, big + 10), ("f2", 5, 9)],
        "file string, v_min long, v_max long",
    )
    # string bounds vs long stats → conservative keep-all
    assert prune_files_df(mdf, "v", str(big + 1), str(big + 5)) == [
        "f1",
        "f2",
    ]
    # one string bound is enough to trip the guard
    assert prune_files_df(mdf, "v", 0, "10") == ["f1", "f2"]
    # typed-vs-typed still prunes normally
    assert prune_files_df(mdf, "v", 0, 10) == ["f2"]


def test_prune_disabled_fallback_logs_event(spark, caplog):
    """Either keep-all degenerate path must emit a
    ``fileskip.prune_disabled`` event so a stale manifest is noticed
    — it silently turns pruning off otherwise."""
    import logging

    from qms_datawarehouse_spark.sources.fileskip import prune_files_df

    mdf_str = spark.createDataFrame(
        [("f1", "9", "95")], "file string, v_min string, v_max string"
    )
    mdf_typed = spark.createDataFrame(
        [("f1", 9, 95)], "file string, v_min long, v_max long"
    )
    with caplog.at_level(logging.INFO, logger="qms_datawarehouse_spark"):
        prune_files_df(mdf_str, "v", 10, 120)  # string stats, typed probe
        prune_files_df(mdf_typed, "v", "10", "120")  # typed stats, str probe
    events = [r for r in caplog.records if "fileskip.prune_disabled" in r.message]
    assert len(events) == 2
    with caplog.at_level(logging.INFO, logger="qms_datawarehouse_spark"):
        caplog.clear()
        prune_files_df(mdf_typed, "v", 10, 120)  # healthy probe: no event
    assert not [
        r for r in caplog.records if "fileskip.prune_disabled" in r.message
    ]


def test_nested_leaf_stat_paths_dont_crash_manifest(spark, tmp_path):
    """Parquet leaf names include dotted nested paths ('s.x') that are
    NOT arrow top-level fields; harvesting a struct column (or its
    dotted leaf) must degrade to NULL bounds, not KeyError the whole
    manifest build."""
    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
    )

    path = str(tmp_path / "nested")
    spark.createDataFrame(
        [(i, (i, f"n{i}")) for i in range(50)],
        "id long, s struct<x: long, name: string>",
    ).repartition(2).write.mode("overwrite").parquet(path)

    # 's' is a top-level STRUCT (no flat stats), 's.x' is a dotted
    # parquet leaf (not an arrow top-level field): both must harvest
    # as NULL bounds while the flat sibling harvests normally
    mdf = file_manifest_df(spark, path, ["s", "s.x", "id"])
    rows = mdf.collect()
    assert rows
    assert all(r["s_min"] is None and r["s_max"] is None for r in rows)
    assert all(r["s.x_min"] is None and r["s.x_max"] is None for r in rows)
    assert all(r["id_min"] is not None for r in rows)
    # NULL bounds → conservative keep-all
    assert len(prune_files_df(mdf, "s.x", 0, 1)) == len(rows)


def test_multi_column_prune_on_zorder_layout(spark, zlayout):
    """Conjunctive pruning is what the z-order layout exists for: a
    (user_id AND ts) probe must keep exactly the intersection of the
    single-column survivors — strictly fewer files than either alone
    here — and the pruned read must equal the full filter."""
    from qms_datawarehouse_spark.sources.fileskip import (
        file_manifest_df,
        prune_files_df,
        prune_files_df_multi,
    )

    full = spark.read.parquet(zlayout)
    # derive narrow ranges from the data (sf0.001 has ~15 user ids)
    u_min, u_max, t_lo, t_hi = full.selectExpr(
        "min(user_id)",
        "max(user_id)",
        "min(ts)",
        "timestampadd(HOUR, 100, min(ts))",
    ).first()
    u_lo, u_hi = int(u_min), int(u_min) + max(1, (int(u_max) - int(u_min)) // 4)

    mdf = file_manifest_df(spark, zlayout, ["user_id", "ts"])
    n_files = mdf.count()
    by_user = prune_files_df(mdf, "user_id", u_lo, u_hi)
    by_ts = prune_files_df(mdf, "ts", t_lo, t_hi)
    both = prune_files_df_multi(
        mdf, {"user_id": (u_lo, u_hi), "ts": (t_lo, t_hi)}
    )
    assert set(both) == set(by_user) & set(by_ts)
    assert by_user and by_ts and both  # both single-column probes hit
    # the conjunction prunes at least as hard as either column, and
    # strictly harder than a full scan — the z-curve's payoff
    assert len(both) <= min(len(by_user), len(by_ts))
    assert len(both) < n_files

    pred = (
        (F.col("user_id") >= u_lo)
        & (F.col("user_id") <= u_hi)
        & (F.col("ts") >= t_lo)
        & (F.col("ts") <= t_hi)
    )
    want = full.filter(pred).count()
    got = spark.read.parquet(*both).filter(pred).count()
    assert got == want


def test_multi_prune_degraded_column_keeps_others(spark):
    """A type-degraded predicate contributes no constraint but must
    NOT disable the other predicates' pruning; all-degraded falls
    back to keep-all."""
    from qms_datawarehouse_spark.sources.fileskip import (
        prune_files_df_multi,
    )

    mdf = spark.createDataFrame(
        [("f1", 0, 9, "a", "c"), ("f2", 10, 19, "d", "f")],
        "file string, v_min long, v_max long, s_min string, s_max string",
    )
    # v prunes normally; s degraded (typed probe on string stats)
    kept = prune_files_df_multi(mdf, {"v": (0, 5), "s": (1, 2)})
    assert kept == ["f1"]
    # all predicates degraded -> conservative keep-all
    kept = prune_files_df_multi(mdf, {"s": (1, 2)})
    assert kept == ["f1", "f2"]
