"""Round-13 degenerate-input audit: Spark 4 runs ANSI mode by default,
so a division whose divisor can reach zero on legitimate degenerate
data (zero-norm embeddings, empty experiment arms, constant groups)
crashes at RUNTIME with DIVIDE_BY_ZERO — while the DuckDB oracles
yield NULL. These tests manufacture each degenerate and pin the
NULL-consistent behavior; before the audit every one of them crashed
(or, for the pandas cosine twin, silently ranked NaN rows FIRST)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ansi_mode_is_actually_on(spark):
    # the premise of this whole audit — if the session ever turns ANSI
    # off, these tests still pass but the rationale comments go stale
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_knn_join_with_zero_norm_vector_does_not_crash(spark):
    from qms_datawarehouse_spark.operators.similarity import knn_join_lsh

    rows = [(i, [float(i + 1), 1.0]) for i in range(12)]
    rows.append((99, [0.0, 0.0]))  # zero-norm row in the corpus
    out = knn_join_lsh(_emb(spark, rows), k=3)
    got = out.collect()  # pre-audit: ArithmeticException DIVIDE_BY_ZERO
    # the zero-norm vector never appears as a scored neighbor
    assert all(r.neighbor_id != 99 or r.cosine is None for r in got)


def test_embedding_dedup_rows_with_zero_norm_pair_do_not_crash(spark, tmp_path):
    """Both embedding dedup rows read an embeddings table — write a
    tiny one where two zero-norm vectors share an LSH bucket (all-zero
    sign pattern) and a brute-force block; pre-audit both kernels
    crashed with DIVIDE_BY_ZERO on those pairs."""
    from qms_datawarehouse_spark.operators.dedup import (
        dedup_embedding_cosine,
        dedup_embedding_lsh,
    )

    dim = 64
    rows = [
        (1, [1.0] + [0.0] * (dim - 1), "a"),
        (2, [1.0] + [0.001] * (dim - 1), "a"),
        (3, [0.0] * dim, "z"),
        (4, [0.0] * dim, "z"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    for fn in (dedup_embedding_cosine, dedup_embedding_lsh):
        got = fn(spark, str(tmp_path)).collect()  # pre-audit: crash
        # zero-norm pairs have NULL cosine -> filtered by the threshold
        assert all({r.doc_a, r.doc_b} != {3, 4} for r in got), fn.__name__


def test_pandas_cosine_twin_masks_zero_norms_to_null(spark):
    """The NaN trap: numpy 0/0 emits NaN, and Spark sorts NaN ABOVE
    every real value under DESC — pre-audit the pandas twin silently
    ranked zero-norm rows FIRST. They must surface as NULL."""
    from qms_datawarehouse_spark.operators.similarity import cosine_pandas_udf

    make = cosine_pandas_udf()
    udf = make([1.0, 0.0])
    df = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 0.0])]).withColumn(
        "c", udf(F.col("embedding").cast("array<double>"))
    )
    got = {r.vec_id: r.c for r in df.collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] is None  # NULL, not NaN


def test_welch_readout_empty_and_single_and_constant_arms(spark):
    from qms_datawarehouse_spark.plans.analytics import _welch_readout

    def frame(rows):
        return spark.createDataFrame(rows, "variant int, x long")

    # empty B arm: every B statistic NULL, A side intact
    r = _welch_readout(frame([(0, 10), (0, 20)])).first()
    assert r["n_b"] == 0 and r["mean_b"] is None and r["t_welch"] is None
    assert r["mean_a"] == pytest.approx(15.0)

    # single-sample arm: variance denominator n-1 = 0 -> NULL t
    r = _welch_readout(frame([(0, 10), (0, 20), (1, 5)])).first()
    assert r["mean_b"] == pytest.approx(5.0) and r["t_welch"] is None

    # two constant arms: pooled stderr 0 -> NULL t (not a crash)
    r = _welch_readout(
        frame([(0, 7), (0, 7), (1, 9), (1, 9)])
    ).first()
    assert r["t_welch"] is None


def test_welch_moments_survive_int64_scale_values(spark):
    """Round-13 overflow audit: Σx² accumulated in a LONG aborts the
    aggregate under ANSI once it clears int64 — two rows of 3e9 cents
    square to 1.8e19 > 2^63-1. The decimal(38,0) accumulation is
    exact; verify against Python bigint arithmetic."""
    from pyspark.sql import functions as F  # noqa: F401

    from qms_datawarehouse_spark.plans.analytics import _welch_readout

    x = 3_000_000_000  # 3e9 cents; x*x = 9e18, two of them overflow
    rows = [(0, x), (0, x), (1, x - 7), (1, x + 7)]
    r = _welch_readout(
        spark.createDataFrame(rows, "variant int, x long")
    ).first()  # pre-audit: ArithmeticException (long overflow) here
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["sx_a"] == 2 * x and r["sx_b"] == 2 * x
    assert r["mean_a"] == float(x) and r["mean_b"] == float(x)
    # t itself rides the double sx·sx shortcut (same formula as the
    # oracle), which loses integer exactness past 2^53 — at these
    # magnitudes its value is numerically meaningless in BOTH engines
    # and may surface as NULL; the property under test is that the
    # aggregation itself no longer aborts and the first moments stay
    # exact.


def test_moments_row_decimal_accumulation_is_exact(spark, tmp_path):
    """stats_sufficient_moments over manufactured near-limit values:
    the decimal accumulation must agree with Python bigints and cast
    back to the contract's BIGINT while it fits."""
    import datetime as dt

    from qms_datawarehouse_spark.plans.analytics import (
        stats_sufficient_moments,
    )

    # 1.7e9 cents each: x*x = 2.89e18, Σ over three = 8.67e18 — just
    # inside the contract's int64 output; the decimal accumulation
    # must round-trip these exactly (double->cents->bigint squares)
    vals = [17_000_000.0, 17_000_001.0, 16_999_999.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 12), 1, "purchase", v)
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = stats_sufficient_moments(spark, str(tmp_path)).first()
    cents = [round(v * 100) for v in vals]
    assert r["sx"] == sum(cents)
    assert r["sxx"] == sum(c * c for c in cents)
    assert r["sxy"] == sum(c * 12 for c in cents)


def test_scd2_and_asof_rows_still_green_after_temporal_touch(spark):
    # cheap canary: the temporal module imports and its two NULL-edge
    # kernels behave on a 3-row frame (full oracle runs cover depth)
    import datetime as dt

    from qms_datawarehouse_spark.operators.temporal import scd2_from_stream

    df = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1), 1), (1, "a", None, 2)],
        "user_id long, state string, ts timestamp, event_id long",
    )
    assert scd2_from_stream(df, "user_id", "state", "ts", "event_id").count() == 1
