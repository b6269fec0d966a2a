"""Round-3 additions: table profiler, Unicode text normalization,
and the split-leakage audit. Cross-engine value checks for their
registered queries run in test_queries_oracle; these tests pin the
operator semantics and plan shapes directly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# --------------------------------------------------------------------
# normalize_text
# --------------------------------------------------------------------


def test_normalize_text_unicode_edges(spark):
    from qms_datawarehouse_spark.operators.textops import normalize_text

    rows = [
        (1, "café  x"),          # composed é + double space
        (2, "café\tx"),         # decomposed e + combining acute + tab
        (3, "a\x08b\x0bc"),           # C0 controls stripped
        (4, None),                     # null passes through
        (5, "  lead trail  "),        # trim
        (6, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    # composed and decomposed accents normalize to the SAME bytes —
    # the property exact dedup/fingerprinting needs
    assert out[1] == out[2] == "café x"
    assert out[3] == "abc"
    assert out[4] is None
    assert out[5] == "lead trail"
    assert out[6] == "already clean"


def test_text_normalize_changed_flag(spark):
    from qms_datawarehouse_spark.plans.registry import REGISTRY

    from tests.conftest import SF_DIR

    out = REGISTRY["text_normalize"].fn(spark, SF_DIR)
    # corpus text is already clean → normalization is an identity map
    # on it, and every row says so
    assert out.filter(F.col("changed")).count() == 0


# --------------------------------------------------------------------
# profile_table
# --------------------------------------------------------------------


@pytest.fixture()
def mixed_df(spark):
    rows = [
        (1, "a", 1.5, None),
        (2, "b", 2.5, "x"),
        (3, None, None, "x"),
        (3, "b", 9.955, "y"),
    ]
    return spark.createDataFrame(
        rows, "k long, s string, v double, t string"
    )


def test_profile_exact_counts_and_serialization(mixed_df):
    from qms_datawarehouse_spark.operators.profile import profile_table

    prof = {r.col_name: r for r in profile_table(mixed_df).collect()}
    assert set(prof) == {"k", "s", "v", "t"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert (prof["k"].n_nulls, prof["k"].n_distinct) == (0, 3)
    assert (prof["s"].n_nulls, prof["s"].n_distinct) == (1, 2)
    assert (prof["t"].n_nulls, prof["t"].n_distinct) == (1, 2)
    assert (prof["k"].min_value, prof["k"].max_value) == ("1", "3")
    # doubles serialize via round(2) → DECIMAL(18,2) → identical text
    # in both engines (9.955 rounds half-up to 9.96... banker's vs
    # half-up doesn't bite at 2dp here; the value is pinned)
    assert prof["v"].min_value == "1.50"
    assert prof["v"].max_value in ("9.95", "9.96")  # rounding mode pin
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")


def test_profile_approx_mode_has_no_expand(mixed_df):
    from qms_datawarehouse_spark.operators.profile import profile_table

    exact_plan = (
        profile_table(mixed_df)._jdf.queryExecution().executedPlan().toString()
    )
    approx = profile_table(mixed_df, exact=False)
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    # exact multi-column distinct pays the Expand; the 100 TB mode
    # (HLL++ sketches) must not
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan
    prof = {r.col_name: r for r in approx.collect()}
    # HLL at 4 rows is exact in practice; counts still land
    assert prof["k"].n_distinct == 3


def test_profile_single_scan(spark):
    from qms_datawarehouse_spark.plans.registry import REGISTRY

    from tests.conftest import SF_DIR

    plan = (
        REGISTRY["profile_orders"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # six columns profiled, ONE scan of orders (the oracle needs six)
    assert plan.count("orders.parquet") == 1


# --------------------------------------------------------------------
# split_leakage
# --------------------------------------------------------------------


def test_split_leakage_flags_only_straddling_clusters(spark):
    from qms_datawarehouse_spark.operators.dedup import split_leakage

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 4), (6, 4)],
        "doc long, cluster_id long",
    )
    splits = spark.createDataFrame(
        [
            (1, "train"),
            (2, "val"),     # cluster 1 straddles train/val → leak
            (3, "train"),   # singleton can't leak
            (4, "train"),
            (5, "train"),
            (6, "train"),   # cluster 4 is train-only → clean
        ],
        "doc_id long, split string",
    )
    out = {r.cluster_id: r for r in split_leakage(clusters, splits).collect()}
    assert set(out) == {1}
    assert out[1].n_docs == 2 and out[1].n_splits == 2
    assert out[1].splits == "train,val"


def test_split_by_cluster_eliminates_leakage(spark):
    """The remedy query's invariant: when splits hash cluster_id,
    split_leakage over the same clusters is EMPTY by construction."""
    from qms_datawarehouse_spark.operators.curation import assign_split
    from qms_datawarehouse_spark.operators.dedup import split_leakage

    clusters = spark.createDataFrame(
        [(d, d // 3) for d in range(60)], "doc long, cluster_id long"
    )
    per_cluster = assign_split(
        clusters.withColumnRenamed("cluster_id", "_cid"), key="_cid"
    )
    splits = per_cluster.select(F.col("doc").alias("doc_id"), "split")
    assert split_leakage(clusters, splits).count() == 0


def test_normalize_control_between_base_and_combining_mark(spark):
    """Regression (hypothesis-found): a control char between a base
    letter and its combining mark must not block NFC composition —
    controls strip FIRST, so the output is composed and idempotent."""
    import unicodedata

    from qms_datawarehouse_spark.operators.textops import normalize_text

    df = spark.createDataFrame([(1, "a\x1f̀")], "doc_id long, text string")
    got = df.select(normalize_text(F.col("text")).alias("n")).first().n
    assert got == "à"  # composed à, single code point
    assert unicodedata.normalize("NFC", got) == got  # a fixed point
