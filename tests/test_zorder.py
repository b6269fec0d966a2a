"""Z-order layout: files-containing-qualifying-rows shrinks on BOTH
curve dimensions vs a single-column-sorted control.

``distinct input_file_name()`` under a selective filter counts the
files a footer-stats reader must touch — the skipping a z-layout buys.
The control (sorted by ts only) prunes on ts but degrades to
most-files-touched on user_id; the z-layout prunes on both.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from qms_datawarehouse_spark.operators.zorder import zorder_code, zorder_write

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("zorder")
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    zpath = str(root / "z")
    spath = str(root / "s")
    zorder_write(events, zpath, ["user_id", "ts"], n_files=N_FILES, bits=6)
    # control: classic single-column sort, same file count
    (
        events.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(spath)
    )
    return zpath, spath


def _files_touched(spark, path, cond):
    df = spark.read.parquet(path).filter(cond)
    return df.select(F.input_file_name()).distinct().count()


def test_zorder_preserves_rows(spark, layouts):
    zpath, _ = layouts
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    z = spark.read.parquet(zpath)
    assert z.count() == events.count()
    assert sorted(z.columns) == sorted(events.columns)


def test_zorder_prunes_on_both_dimensions(spark, layouts):
    zpath, spath = layouts
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lo, hi = events.select(
        F.expr("approx_percentile(user_id, 0.40)"),
        F.expr("approx_percentile(user_id, 0.45)"),
    ).first()
    cond_user = (F.col("user_id") >= lo) & (F.col("user_id") <= hi)

    z_user = _files_touched(spark, zpath, cond_user)
    s_user = _files_touched(spark, spath, cond_user)
    # ts-sorted control scatters a user range across ~all files;
    # z-order confines it to a minority of files
    assert s_user > N_FILES * 0.75
    assert z_user < s_user
    assert z_user <= N_FILES * 0.5

    t_lo, t_hi = events.select(
        F.expr("approx_percentile(ts, 0.40)"),
        F.expr("approx_percentile(ts, 0.45)"),
    ).first()
    cond_ts = (F.col("ts") >= t_lo) & (F.col("ts") <= t_hi)
    z_ts = _files_touched(spark, zpath, cond_ts)
    # the curve still localizes time: far better than all-files
    assert z_ts <= N_FILES * 0.5


def test_zorder_code_is_deterministic(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200)
    a = events.select(zorder_code(events, ["user_id", "value"], bits=4).alias("z"))
    b = events.select(zorder_code(events, ["user_id", "value"], bits=4).alias("z"))
    assert [r.z for r in a.collect()] == [r.z for r in b.collect()]
