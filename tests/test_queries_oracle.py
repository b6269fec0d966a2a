"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same comparison the driver runs at sf0.01 (row count +
sorted-column schema + order-insensitive value multiset); running it
in the suite keeps regressions out of the correctness gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.oracle_harness import TABLES, compare_one

from qms_datawarehouse_spark.plans.registry import REGISTRY


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    if qd.sql is None:
        assert qd.fn(spark, SF_DIR).count() >= 0  # rows-only contract
        return
    problems = compare_one(spark, duck, name, qd.fn, qd.sql, SF_DIR)
    assert not problems, f"{name}: {problems}"


def test_float_sum_queries_are_run_stable(spark):
    """The only queries whose value hash rides a float SUM (bigram LM
    log-probs; the A/B t derivation) must give identical rounded
    results across two executions in one session — shuffle-merge
    order must stay under the rounding grain."""
    for name in ("text_bigram_lm_score", "experiment_ab_ttest"):
        fn = REGISTRY[name].fn
        a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
        assert a == b, name


def test_sketch_aggregates_library_pin(spark, duck):
    """``sketch_aggregates`` left the registry (native HLL++/GK sketch
    values are engine-specific — the row could never hash-match; the
    deterministic KMV/CMS/bottom-k family carries the driver evidence)
    but stays the demonstration of Spark's mergeable-sketch path:
    stable schema, and HLL++ estimates within its 1% rsd of the exact
    distinct counts DuckDB computes."""
    from qms_datawarehouse_spark.plans.advanced import sketch_aggregates

    out = {r["returnflag"]: r for r in sketch_aggregates(spark, SF_DIR).collect()}
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, count(DISTINCT l_partkey) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    )
    assert set(out) == set(exact)
    for flag, row in out.items():
        assert abs(row["approx_parts"] - exact[flag]) <= 0.05 * exact[flag]
        assert row["n_lines"] > 0 and row["price_quantiles"].startswith("[")
