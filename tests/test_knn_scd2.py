"""Semantics tests for the k-NN self-join and SCD2 operators on
crafted frames (properties the fixture oracle can't isolate)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.similarity import (
    knn_join_lsh,
    lsh_bucketed,
)
from qms_datawarehouse_spark.operators.temporal import scd2_from_stream


def _emb(spark, n=60, dim=64, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_join_matches_brute_force_within_buckets(spark):
    df = _emb(spark)
    out = knn_join_lsh(df, k=3).collect()
    buckets = {
        r.vec_id: r.bucket for r in lsh_bucketed(df).select("vec_id", "bucket").collect()
    }
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in df.collect()
    }
    # independent reference: per query, rank in-bucket candidates by
    # (rounded cosine desc, id asc)
    got = {}
    for r in out:
        got.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for qid, q in vecs.items():
        cands = []
        for cid, c in vecs.items():
            if cid == qid or buckets[cid] != buckets[qid]:
                continue
            cos = float(q @ c / (np.linalg.norm(q) * np.linalg.norm(c)))
            cands.append((-round(cos, 4), cid))
        cands.sort()
        expect = [(i + 1, cid) for i, (_, cid) in enumerate(cands[:3])]
        have = sorted((rk, nid) for rk, nid, _ in got.get(qid, []))
        assert have == expect, f"qid={qid}"


def test_knn_join_is_symmetric_candidate_set(spark):
    # neighborhood is bucket-bounded: every reported neighbor shares
    # the query's bucket
    df = _emb(spark, n=40)
    buckets = {
        r.vec_id: r.bucket for r in lsh_bucketed(df).select("vec_id", "bucket").collect()
    }
    for r in knn_join_lsh(df, k=5).collect():
        assert buckets[r.vec_id] == buckets[r.neighbor_id]


def _ts(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_scd2_collapses_consecutive_duplicates(spark):
    rows = [
        (1, "a", _ts(0), 10),
        (1, "a", _ts(1), 11),  # duplicate state — collapses
        (1, "b", _ts(2), 12),
        (1, "a", _ts(3), 13),  # back to a — NEW version (type 2)
        (2, "x", _ts(0), 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    )
    out = scd2_from_stream(df, "user_id", "state", "ts", "event_id")
    u1 = sorted(
        [
            (r.state, r.valid_from, r.valid_to, r.is_current)
            for r in out.filter("user_id = 1").collect()
        ],
        key=lambda t: t[1],
    )
    assert [s for s, *_ in u1] == ["a", "b", "a"]
    assert u1[0][1] == _ts(0) and u1[0][2] == _ts(2)
    assert u1[1][1] == _ts(2) and u1[1][2] == _ts(3)
    assert u1[2][2] is None and u1[2][3] is True
    # intervals tile: each valid_to equals the next valid_from
    assert u1[0][2] == u1[1][1] and u1[1][2] == u1[2][1]


def test_scd2_equal_ts_tiebreak_is_deterministic(spark):
    # two changes at the SAME timestamp: event_id decides the order,
    # so the later event_id wins the open interval
    rows = [(1, "a", _ts(0), 1), (1, "b", _ts(0), 2)]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    )
    out = {
        r.state: r for r in scd2_from_stream(df, "user_id", "state", "ts", "event_id").collect()
    }
    assert out["b"].is_current and not out["a"].is_current


def test_scd2_asof_lookup_state_at_transition_instant(spark):
    """A fact row whose ts EQUALS a state's valid_from gets that state
    (>= as-of semantics), and earlier facts get the prior state."""
    import datetime as dt

    import pyspark.sql.functions as F

    from qms_datawarehouse_spark.operators.temporal import (
        asof_join,
        scd2_from_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    events = spark.createDataFrame(
        [
            (1, 7, "view", ts(0)),
            (2, 7, "view", ts(5)),     # consecutive dup collapses
            (3, 7, "click", ts(10)),   # state change
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    dim = scd2_from_stream(
        events, key="user_id", attr="event_type", ts_col="ts",
        tiebreak="event_id",
    ).select(
        "user_id", F.col("event_type").alias("state"), "valid_from"
    )
    facts = spark.createDataFrame(
        [(100, 7, ts(10)), (101, 7, ts(9)), (102, 7, ts(30))],
        "fact_id long, user_id long, ts timestamp",
    )
    out = {
        r.fact_id: r.asof_state
        for r in asof_join(
            facts, dim, key="user_id", left_ts="ts",
            right_ts="valid_from", right_cols=["state"],
        ).collect()
    }
    assert out == {100: "click", 101: "view", 102: "click"}


def test_scd2_null_state_transitions(spark):
    """NULL is a legitimate dimension state (round 12): value→NULL
    opens a new history row (the old `prev != attr` comparison
    returned NULL and silently dropped it), consecutive NULLs
    collapse into ONE interval (the old first-row test `prev IS NULL`
    re-opened a row per NULL), and NULL→value closes it."""
    rows = [
        (1, "a", _ts(0), 10),
        (1, None, _ts(1), 11),  # a → NULL: must open a NULL row
        (1, None, _ts(2), 12),  # NULL → NULL: collapses
        (1, "a", _ts(3), 13),   # NULL → a: new version
        (2, None, _ts(0), 20),  # first row IS a NULL state
        (2, None, _ts(1), 21),  # collapses into it
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    )
    out = scd2_from_stream(df, "user_id", "state", "ts", "event_id")
    u1 = sorted(
        [
            (r.state, r.valid_from, r.valid_to, r.is_current)
            for r in out.filter("user_id = 1").collect()
        ],
        key=lambda t: t[1],
    )
    assert [s for s, *_ in u1] == ["a", None, "a"]
    assert u1[0][2] == _ts(1) and u1[1][1] == _ts(1)
    assert u1[1][2] == _ts(3) and u1[2][1] == _ts(3)
    assert u1[2][3] is True
    u2 = [
        (r.state, r.is_current)
        for r in out.filter("user_id = 2").collect()
    ]
    assert u2 == [(None, True)]  # one open NULL interval, not two


def test_scd2_null_ts_rows_are_dropped(spark):
    """NULL-ts change events carry no position on the timeline
    (round 13, ADVICE low): they must be dropped, not sorted
    nulls-first. Pre-fix, a key's first REAL-ts row saw lag(ts)=NULL
    and opened a spurious duplicate interval even when its value
    equalled the NULL-ts row's state — and the NULL-ts rows
    themselves leaked out as NULL-valid_from history."""
    rows = [
        (1, "a", None, 9),     # unplaceable — must vanish
        (1, "a", _ts(0), 10),  # same state: must NOT duplicate
        (1, "b", _ts(1), 11),
        (2, "x", None, 20),    # a key with ONLY NULL-ts rows
    ]
    df = spark.createDataFrame(
        rows, "user_id long, state string, ts timestamp, event_id long"
    )
    out = scd2_from_stream(df, "user_id", "state", "ts", "event_id")
    assert out.filter("valid_from IS NULL").count() == 0
    u1 = sorted(
        [
            (r.state, r.valid_from, r.valid_to, r.is_current)
            for r in out.filter("user_id = 1").collect()
        ],
        key=lambda t: t[1],
    )
    assert [s for s, *_ in u1] == ["a", "b"]
    assert u1[0][1] == _ts(0) and u1[0][2] == _ts(1)
    assert u1[1][3] is True
    assert out.filter("user_id = 2").count() == 0


def test_asof_join_null_timestamps_never_match(spark):
    """SQL asof semantics under NULLs (round 12): a NULL-ts right row
    matches NOTHING (it used to sort nulls-first and become a bogus
    -infinity match for the whole key); a NULL-ts left row is kept
    with NULL asof columns."""
    from qms_datawarehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _ts(2), "L1"), (1, None, "L2")],
        "k long, lts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, _ts(1), "real")],
        "k long, rts timestamp, rv string",
    )
    out = {
        r.lv: r.asof_rv
        for r in asof_join(left, right, "k", "lts", "rts", ["rv"]).collect()
    }
    # L1 (t=2) matches the REAL t=1 row, never the NULL-ts ghost;
    # L2 (NULL ts) matches nothing but is not dropped
    assert out == {"L1": "real", "L2": None}, out

    # with ONLY a NULL-ts right row, no left row matches anything
    ghost_only = right.filter("rv = 'ghost'")
    out2 = {
        r.lv: r.asof_rv
        for r in asof_join(
            left, ghost_only, "k", "lts", "rts", ["rv"]
        ).collect()
    }
    assert out2 == {"L1": None, "L2": None}, out2
