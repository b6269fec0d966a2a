"""Round-6 operator invariants — structural guarantees the oracle
hash can't express directly: credit conservation for multi-touch
attribution, audit-family consistency, kmeans partition laws."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR


def test_position_weighted_credit_is_conserved(spark):
    """Every converted journey with >=1 touch distributes EXACTLY
    10000 bp — the U-shape must never leak or mint credit (the
    integer remainder rule exists for this)."""
    from qms_datawarehouse_spark.plans.analytics import (
        attribution_position_weighted,
    )

    out = attribution_position_weighted(spark, SF_DIR)
    total_credit = out.agg(F.sum("credit_bp")).first()[0]

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = (
        F.sum((F.col("event_type") == "purchase").cast("int")).over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        - (F.col("event_type") == "purchase").cast("int")
    )
    seq = events.select("user_id", "event_type", w.alias("journey"))
    conv = (
        seq.filter(F.col("event_type") == "purchase")
        .select("user_id", "journey")
        .distinct()
    )
    touched = (
        seq.filter(F.col("event_type") != "purchase")
        .join(conv, ["user_id", "journey"], "left_semi")
        .select("user_id", "journey")
        .distinct()
        .count()
    )
    assert total_credit == 10000 * touched


def test_l_diversity_classes_match_k_anon_classes(spark):
    """Both privacy audits group on the SAME quasi-identifier tuple:
    class sets and sizes must agree, and the l-count can never exceed
    the class size."""
    from qms_datawarehouse_spark.operators.curation import (
        _L_DIV,
        k_anonymity_audit,
        l_diversity_audit,
    )

    k = {
        (r["nationkey"], r["mktsegment"]): r["n"]
        for r in k_anonymity_audit(spark, SF_DIR).collect()
    }
    rows = l_diversity_audit(spark, SF_DIR).collect()
    l = {(r["nationkey"], r["mktsegment"]): r for r in rows}
    assert set(k) == set(l)
    for cls, r in l.items():
        assert r["n"] == k[cls]
        assert 1 <= r["l_sensitive"] <= r["n"]
        assert r["violates_l"] == (r["l_sensitive"] < _L_DIV)


def test_minhash_audit_covers_every_verified_pair(spark):
    """The calibration audit runs over ALL LSH candidate pairs, so
    every pair the production dedup verifies (jaccard >= 0.5) must
    appear with exact_bp >= 5000 and a sketch estimate on the 1250-bp
    lattice."""
    from qms_datawarehouse_spark.operators.dedup import (
        dedup_minhash_estimate_audit,
        dedup_minhash_lsh,
    )

    audit = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup_minhash_estimate_audit(spark, SF_DIR).collect()
    }
    verified = dedup_minhash_lsh(spark, SF_DIR).collect()
    assert verified, "fixture must contain near-dups"
    for v in verified:
        r = audit[(v["doc_a"], v["doc_b"])]
        assert r["exact_bp"] >= 5000
    for r in audit.values():
        assert r["m_agree"] in range(0, 9)
        assert r["est_bp"] == r["m_agree"] * 1250
        assert 0 <= r["exact_bp"] <= 10000
        assert r["err_bp"] == r["est_bp"] - r["exact_bp"]


def test_kmeans_partitions_corpus_exactly(spark):
    """Cluster sizes must partition the corpus (every vector assigned
    exactly once), all K seeds survive, and reruns are identical —
    the determinism the driver hash depends on."""
    from qms_datawarehouse_spark.operators.similarity import (
        _KM_K,
        embedding_kmeans_2iter,
    )

    a = embedding_kmeans_2iter(spark, SF_DIR).collect()
    n_corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(a) == _KM_K
    assert sum(r["n_members"] for r in a) == n_corpus
    assert all(r["inertia"] > 0 for r in a)
    b = embedding_kmeans_2iter(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---- property: U-shape credits vs an independent Python model -------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

event_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=6),  # ts (ties allowed)
        st.sampled_from(["view", "click", "signup", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


def _model_credits(rows):
    """Independent U-shape model: journeys from a running purchase
    count per user, credit 10000/5000+5000/4000-middles-4000 with the
    integer remainder on the earliest middle."""
    per_user: dict = {}
    for eid, (u, ts, et) in enumerate(rows):
        per_user.setdefault(u, []).append((ts, eid, et))
    credit: dict = {}
    touches_out: dict = {}
    for u, evs in per_user.items():
        evs.sort()
        journeys: dict = {}
        converted = set()
        j = 0
        for ts, eid, et in evs:
            if et == "purchase":
                converted.add(j)
                j += 1
            else:
                journeys.setdefault(j, []).append(et)
        for jid in converted:
            ts_list = journeys.get(jid, [])
            n = len(ts_list)
            for pos, et in enumerate(ts_list, start=1):
                if n == 1:
                    c = 10000
                elif n == 2:
                    c = 5000
                elif pos == 1 or pos == n:
                    c = 4000
                else:
                    c = 2000 // (n - 2) + (2000 % (n - 2) if pos == 2 else 0)
                credit[et] = credit.get(et, 0) + c
                touches_out[et] = touches_out.get(et, 0) + 1
    return credit, touches_out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=event_strategy)
def test_position_weighted_matches_model(spark, rows):
    from qms_datawarehouse_spark.plans.analytics import (
        position_weighted_credits,
    )

    df = spark.createDataFrame(
        [(u, ts, f"e{eid:04d}", et) for eid, (u, ts, et) in enumerate(rows)],
        "user_id long, ts long, event_id string, event_type string",
    )
    got = {
        r["channel"]: (r["n_touches"], r["credit_bp"])
        for r in position_weighted_credits(df).collect()
    }
    credit, touches = _model_credits(rows)
    assert got == {et: (touches[et], credit[et]) for et in credit}


def test_content_checksum_is_order_independent_and_sensitive(spark):
    """The checksum must be invariant under any physical reshuffle of
    the same rows, and must move when ONE row's content changes — the
    two properties that make it a replication verifier."""
    from qms_datawarehouse_spark.plans.modern import dq_content_checksum

    base = {
        r["priority"]: (r["n_rows"], r["content_checksum"])
        for r in dq_content_checksum(spark, SF_DIR).collect()
    }

    import tempfile

    d = tempfile.mkdtemp()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # same content, different physical order / layout
    orders.orderBy(F.rand(7)).repartition(7).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    shuffled = {
        r["priority"]: (r["n_rows"], r["content_checksum"])
        for r in dq_content_checksum(spark, d).collect()
    }
    assert shuffled == base

    # one row's totalprice nudged by a cent: exactly one group moves
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") == orders.agg(F.min("o_orderkey")).first()[0],
            F.col("o_totalprice") + 0.01,
        ).otherwise(F.col("o_totalprice")),
    )
    mutated.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    changed = {
        r["priority"]: (r["n_rows"], r["content_checksum"])
        for r in dq_content_checksum(spark, d).collect()
    }
    diff = [p for p in base if changed[p] != base[p]]
    assert len(diff) == 1
    assert changed[diff[0]][0] == base[diff[0]][0]  # count same, hash moved
