"""Invariants for the round-7 third-wave operators: ppjoin prefix
filtering (lossless AND actually pruning), the KS statistic against an
independent numpy model, the bucketed join's zero-Exchange plan, and
matview-replay determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_DIR
from qms_datawarehouse_spark.operators.dedup import (
    _shingled,
    dedup_ppjoin_exact,
)


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.n_common, r.na, r.nb) for r in df.collect()}


def test_ppjoin_is_lossless_vs_exhaustive(spark):
    got = _pairs(dedup_ppjoin_exact(spark, SF_DIR))

    # independent exhaustive baseline: every shared-shingle pair,
    # thresholded with the same integer compare
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = _shingled(docs)
    sx = sh.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    a, b = sx.alias("a"), sx.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").cast("long").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").cast("long").alias("nb"))
    want = _pairs(
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.lit(9) * F.col("n_common") >= F.lit(4) * (F.col("na") + F.col("nb")))
    )
    assert got == want
    assert len(got) > 0  # the fixture plants near-dups; empty = broken


def test_ppjoin_prefix_actually_prunes(spark):
    # the point of the prefix filter: candidate pairs from prefixes
    # must be a strict subset of all shared-shingle pairs
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = _shingled(docs).persist()
    sx = sh.select("doc_id", F.explode("shingles").alias("t"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    df_counts = sx.groupBy("t").agg(F.count("*").alias("df"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("t").asc())
    prefix = (
        sx.join(df_counts, "t")
        .select("doc_id", "t", F.row_number().over(w).alias("r"))
        .join(sizes, "doc_id")
        .filter(F.col("r") <= F.expr("n - ((4 * n + 4) div 5) + 1"))
        .select("doc_id", "t")
    )

    def n_pairs(tok):
        ta, tb = tok.alias("a"), tok.alias("b")
        return (
            ta.join(
                tb,
                (F.col("a.t") == F.col("b.t"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    n_prefix = n_pairs(prefix)
    n_all = n_pairs(sx.select("doc_id", F.col("t")))
    sh.unpersist()
    assert 0 < n_prefix < n_all
    # at τ=0.8 the prefix is ~1/5 of each set; candidate volume should
    # collapse by far more than 2x on this corpus
    assert n_prefix * 2 < n_all


def test_ks_drift_matches_numpy_model(spark):
    from qms_datawarehouse_spark.plans.analytics import stats_ks_drift

    row = stats_ks_drift(spark, SF_DIR).collect()[0]

    pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice", "o_orderdate"])
    cents = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    early = pdf["o_orderdate"].to_numpy() < np.datetime64("1996-01-01")
    s1, s2 = np.sort(cents[early]), np.sort(cents[~early])
    n1, n2 = len(s1), len(s2)
    grid = np.unique(cents)
    cum1 = np.searchsorted(s1, grid, side="right").astype(np.int64)
    cum2 = np.searchsorted(s2, grid, side="right").astype(np.int64)
    d_num = int(np.max(np.abs(cum1 * n2 - cum2 * n1)))
    assert (row.n1, row.n2, row.d_num) == (n1, n2, d_num)
    assert row.d_stat == round(d_num / (n1 * n2), 6)


def test_bucketed_join_scan_plan_stays_shuffle_free(spark):
    from qms_datawarehouse_spark.sources.bucketed import bucketed_join_scan

    out = bucketed_join_scan(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2
    assert out.count() > 0


def test_matview_replay_is_deterministic_across_runs(spark):
    from qms_datawarehouse_spark.operators.matview import (
        matview_incremental_replay,
    )

    r1 = sorted(map(tuple, matview_incremental_replay(spark, SF_DIR).collect()))
    r2 = sorted(map(tuple, matview_incremental_replay(spark, SF_DIR).collect()))
    assert r1 == r2 and len(r1) > 0


def test_zorder_routed_scan_prunes_and_returns_rows(spark):
    from qms_datawarehouse_spark.operators.zorder import zorder_routed_scan

    out = zorder_routed_scan(spark, SF_DIR)  # in-query guard asserts prune < all
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_events > 0 for r in rows)


def test_semantic_pair_volume_scales_inverse_k(spark):
    """The dedup_semantic 10x-probe outlier's named cause, as an
    executable claim: the within-cluster pair term is ~N^2/K, so the
    production K ∝ N knob keeps it linear. Pin that doubling K
    roughly halves sum(cluster_size^2) on the fixture (measured decay
    63474 -> 31410 -> 16156 -> 8284 for K=4..32 — almost exactly 1/K;
    the assertion allows slack for cluster imbalance)."""
    from qms_datawarehouse_spark.operators.kmeans_core import (
        _km_assign,
        _km_quantized,
    )
    from qms_datawarehouse_spark.operators.semantic_gate import (
        train_semantic_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = _km_quantized(emb).persist()
    sum_sq = []
    for k in (4, 8, 16, 32):
        cents = train_semantic_centroids(q, k)
        cl = cents.agg(F.collect_list(F.struct("cid", "cv")).alias("cents"))
        sizes = _km_assign(q, cl).groupBy("cid").count()
        row = sizes.agg(
            F.sum(F.col("count") * F.col("count")).alias("ss"),
            F.count("*").alias("nc"),
        ).first()
        assert row.nc == k  # every seed keeps a nonempty cluster here
        sum_sq.append(row.ss)
    q.unpersist()
    for smaller_k, larger_k in zip(sum_sq, sum_sq[1:]):
        assert larger_k * 16 < smaller_k * 10  # >= 1.6x drop per doubling


def test_bootstrap_poisson_is_statistically_sane(spark):
    """The replicate means must bracket the true mean (32 replicas —
    astronomically unlikely to all land one side), each replicate
    draws n +- ~3*sqrt(n) rows (Poisson(1) sum), and the spread is
    nonzero (weights actually vary)."""
    from qms_datawarehouse_spark.plans.analytics import (
        stats_bootstrap_poisson,
    )

    rows = stats_bootstrap_poisson(spark, SF_DIR).collect()
    assert len(rows) == 32
    pdf = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_totalprice"])
    cents = np.floor(pdf["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    n, true_mean = len(cents), int(cents.sum() // len(cents))
    means = [r.mean_cents for r in rows]
    assert min(means) <= true_mean <= max(means)
    assert min(means) < max(means)
    for r in rows:
        assert abs(r.n_drawn - n) <= 4 * int(np.sqrt(n)) + 5


def test_cuped_matches_numpy_model(spark):
    """Independent recomputation: per-user pre/post dollar sums and the
    pooled-theta adjustment in numpy must reproduce the query's
    rounded outputs exactly (same integer inputs, same final
    divisions)."""
    import hashlib

    from qms_datawarehouse_spark.plans.analytics import (
        experiment_cuped_adjusted,
    )

    got = {
        r.arm: (r.n_arm, r.mean_y, r.mean_y_adj, r.rho2)
        for r in experiment_cuped_adjusted(spark, SF_DIR).collect()
    }

    pdf = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    lo, hi = int(us.min()), int(us.max())
    cut = lo + (hi - lo) // 2
    dollars = (np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype(np.int64)) // 100
    pre = us < cut
    df = pd.DataFrame(
        {
            "user_id": pdf["user_id"].to_numpy(),
            "x": np.where(pre, dollars, 0),
            "y": np.where(pre, 0, dollars),
        }
    )
    pu = df.groupby("user_id", as_index=False).sum()

    def arm(uid) -> int:
        h = hashlib.md5(str(uid).encode()).hexdigest()[:8]
        return int(h, 16) % 2

    pu["arm"] = [arm(u) for u in pu["user_id"]]
    x, y = pu["x"].to_numpy(np.int64), pu["y"].to_numpy(np.int64)
    n = len(pu)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy, syy = int((x * x).sum()), int((x * y).sum()), int((y * y).sum())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = round(theta * ((n * sxy - sx * sy) / (n * syy - sy * sy)), 4)
    for a in (0, 1):
        sel = pu["arm"] == a
        n_arm = int(sel.sum())
        sxa, sya = int(pu.loc[sel, "x"].sum()), int(pu.loc[sel, "y"].sum())
        mean_y = round(sya / n_arm, 4)
        mean_adj = round(sya / n_arm - theta * (sxa / n_arm - sx / n), 4)
        assert got[a] == (n_arm, mean_y, mean_adj, rho2)


def test_dp_laplace_matches_python_model(spark):
    """Independent recomputation: the seeded Laplace noise from
    hashlib + math.log must reproduce every class's rounded noise and
    noisy count."""
    import hashlib
    import math

    from qms_datawarehouse_spark.operators.curation import (
        privacy_dp_laplace_counts,
    )

    rows = privacy_dp_laplace_counts(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        h = hashlib.md5(f"{r.nationkey}|{r.mktsegment}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 2**32
        noise = -math.log(2.0 - 2.0 * u) if u >= 0.5 else math.log(2.0 * u)
        assert r.noise == round(noise, 4), (r, noise)
        assert r.noisy_count == round(r.n + noise, 1)


def test_kcenter_greedy_is_monotone_and_covering(spark):
    """Farthest-point invariants: selection distances are
    non-increasing (each pick is the global max of a min-distance
    that only shrinks as centers are added), ids are distinct, and
    the seed is the lowest vec_id."""
    from qms_datawarehouse_spark.operators.curation import (
        curation_coreset_kcenter,
    )

    rows = sorted(
        curation_coreset_kcenter(spark, SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, 9))
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 8
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert ids[0] == emb.agg(F.min("vec_id")).first()[0]
    d = [r.dist2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(d, d[1:]))
    assert all(x > 0 for x in d)


def test_drift_gates_fail_loudly_on_degenerate_epochs(spark):
    """The empty-epoch guards must raise with a message, not emit the
    NULL that would silently diverge from the oracle's zero-division
    error."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from qms_datawarehouse_spark.plans.analytics import stats_ks_drift
    from qms_datawarehouse_spark.plans.modern import dq_distribution_drift

    one_date = spark.createDataFrame(
        [(i, 100.0 + i, "1995-06-01") for i in range(5)],
        "o_orderkey long, o_totalprice double, d string",
    ).selectExpr("o_orderkey", "o_totalprice", "CAST(d AS DATE) AS o_orderdate")
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="drift_guard_")
    one_date.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    with pytest.raises(Exception, match="one snapshot is empty"):
        stats_ks_drift(spark, tmp).collect()

    one_ts = spark.createDataFrame(
        [(i, "2024-01-01 12:00:00", "click", 1.0) for i in range(5)],
        "event_id long, t string, event_type string, value double",
    ).selectExpr("event_id", "CAST(t AS TIMESTAMP) AS ts", "event_type", "value")
    one_ts.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    with pytest.raises(Exception, match="an epoch is empty"):
        dq_distribution_drift(spark, tmp).collect()


def test_pid_scoped_dirs_reap_stale_siblings(tmp_path):
    import os
    import shutil
    import tempfile

    from qms_datawarehouse_spark.tmputil import pid_scoped_dir

    base = os.path.join(tempfile.gettempdir(), "qms_tmputil_t")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "999999"))  # dead pid
    os.makedirs(os.path.join(base, "1"))  # alive (init)
    # legacy (pre-pid-isolation) layout dir — reaped too since r8:
    # only this module ever owned the family root, and these are
    # exactly the stale layouts that once masked a broken test
    os.makedirs(os.path.join(base, "not_a_pid"))
    p = pid_scoped_dir("qms_tmputil_t", "x")
    assert not os.path.exists(os.path.join(base, "999999"))
    assert os.path.exists(os.path.join(base, "1"))
    assert not os.path.exists(os.path.join(base, "not_a_pid"))
    assert p.endswith(os.path.join(str(os.getpid()), "x"))
    shutil.rmtree(base, ignore_errors=True)


def test_prefix_filter_theorem_holds_on_random_sets():
    """Fixture-independent pin of the PPJoin math: for ANY two sets
    with J >= 4/5 and ANY global total order, the first
    n - ceil(0.8n) + 1 elements of each (by that order) intersect —
    with ceil computed by the operator's integer form (4n+4) div 5.
    Hypothesis searches for a counterexample."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        common=st.sets(st.integers(0, 60), min_size=8, max_size=40),
        only_a=st.sets(st.integers(61, 80), max_size=3),
        only_b=st.sets(st.integers(81, 99), max_size=3),
        seed=st.randoms(use_true_random=False),
    )
    def check(common, only_a, only_b, seed):
        a, b = common | only_a, common | only_b
        inter = len(a & b)
        if 9 * inter < 4 * (len(a) + len(b)):  # J < 0.8 — no claim
            return
        order = list(range(100))
        seed.shuffle(order)
        rank = {v: i for i, v in enumerate(order)}

        def prefix(s):
            n = len(s)
            p = n - ((4 * n + 4) // 5) + 1
            return set(sorted(s, key=lambda v: rank[v])[:p])

        assert prefix(a) & prefix(b), (sorted(a), sorted(b), order)

    check()


def test_ks_drift_property_vs_numpy_on_random_data(spark):
    """Fixture-independent KS pin: random cent values and date splits
    through the registered query must equal the numpy two-sample
    statistic exactly (integers end to end)."""
    import datetime as dt
    import os
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qms_datawarehouse_spark.plans.analytics import stats_ks_drift

    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.integers(100, 99999), min_size=20, max_size=60
        ),
        data=st.data(),
    )
    def check(vals, data):
        n = len(vals)
        # at least one order on each side of the 1996-01-01 cut
        n_early = data.draw(st.integers(1, n - 1))
        rows = []
        for i, cents in enumerate(vals):
            d = dt.date(1994, 1, 1) if i < n_early else dt.date(1997, 1, 1)
            rows.append((i, cents / 100.0, d))
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_totalprice double, o_orderdate date"
        )
        tmp = tempfile.mkdtemp(prefix="ks_prop_")
        df.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
        row = stats_ks_drift(spark, tmp).collect()[0]

        arr = np.floor(np.array(vals, dtype=np.float64) / 100.0 * 100 + 0.5).astype(np.int64)
        s1, s2 = np.sort(arr[:n_early]), np.sort(arr[n_early:])
        grid = np.unique(arr)
        cum1 = np.searchsorted(s1, grid, side="right").astype(np.int64)
        cum2 = np.searchsorted(s2, grid, side="right").astype(np.int64)
        d_num = int(np.max(np.abs(cum1 * len(s2) - cum2 * len(s1))))
        assert (row.n1, row.n2, row.d_num) == (n_early, n - n_early, d_num)

    check()
