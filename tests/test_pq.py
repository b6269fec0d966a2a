"""Trained product quantization: encode optimality, ADC identity,
Lloyd's descent, and recall against exact search.

The registered ``similarity_pq_adc`` query (seed codebook, exact
integers) is oracle-checked by test_queries_oracle; these tests cover
the TRAINED float path that has no SQL oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.pq import (
    K_CODES,
    M_SUBSPACES,
    SUB_DIM,
    _assign_codes,
    _fsq_l2,
    _subvectors,
    pq_adc_topk,
    pq_encode,
    train_pq_codebooks,
)
from qms_datawarehouse_spark.plans.registry import tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    (embeddings,) = tables(spark, SF_DIR, "embeddings")
    return embeddings.cache()


@pytest.fixture(scope="module")
def trained(emb):
    return train_pq_codebooks(emb, iterations=2).cache()


def test_codebook_shape(trained):
    rows = trained.collect()
    assert len(rows) == M_SUBSPACES * K_CODES
    assert all(len(r.cv) == SUB_DIM for r in rows)


def test_encode_is_true_argmin(spark, emb, trained):
    """Every assigned codeword must achieve the minimum distance over
    all K codewords of its subspace (ties broken by code_id)."""
    sub = _subvectors(emb)
    assigned = _assign_codes(sub, trained)
    # brute force: join every (vec, sub) against all codewords
    brute = (
        sub.join(trained, "sub_id")
        .select(
            "vec_id",
            "sub_id",
            "code_id",
            _fsq_l2(F.col("sv"), F.col("cv")).alias("d"),
        )
        .groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("d", "code_id")).alias("best"))
        .select(
            "vec_id",
            "sub_id",
            F.col("best")["code_id"].alias("brute_code"),
        )
    )
    diff = (
        assigned.join(brute, ["vec_id", "sub_id"])
        .filter(F.col("code_id") != F.col("brute_code"))
        .count()
    )
    assert diff == 0


def test_adc_equals_reconstructed_distance(spark, emb, trained):
    """LUT-summed ADC == distance computed directly from the assigned
    codewords (identical partial sums, so equality is to float
    round-off of the summation ORDER only)."""
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    encoded = pq_encode(emb, trained)
    adc = {r.vec_id: r.adc for r in pq_adc_topk(encoded, trained, qv, top_k=50).collect()}

    qlit = F.array(*[F.lit(x) for x in qv])
    direct = (
        _assign_codes(_subvectors(emb), trained)
        .join(trained, ["sub_id", "code_id"])
        .select(
            "vec_id",
            "sub_id",
            _fsq_l2(
                F.slice(qlit, F.col("sub_id") * SUB_DIM + 1, SUB_DIM),
                F.col("cv"),
            ).alias("dq"),
        )
        .groupBy("vec_id")
        .agg(F.sum("dq").alias("adc_direct"))
    )
    direct_map = {r.vec_id: r.adc_direct for r in direct.collect()}
    for vec_id, a in adc.items():
        assert abs(a - direct_map[vec_id]) < 1e-6


def _mean_assign_dist(emb, codebooks) -> float:
    return (
        _assign_codes(_subvectors(emb), codebooks)
        .agg(F.avg("d"))
        .first()[0]
    )


def test_lloyds_descends(emb, trained):
    seed = train_pq_codebooks(emb, iterations=0)
    assert _mean_assign_dist(emb, trained) <= _mean_assign_dist(emb, seed) + 1e-9


def test_shortlist_recall(spark, emb, trained):
    """recall@10-in-top-50, averaged over 5 query vectors: the
    guarantee PQ actually makes is that the true neighbors survive
    into a SHORTLIST the caller exact-reranks (FAISS IVFPQ usage), not
    that raw ADC order equals exact order at k=10. A single-query
    seed-vs-trained comparison is meaningless here — the seed codebook
    contains the query's own subvectors (d(q_s, code)=0 collapses its
    neighborhood onto code 0), and one query's recall at n=500 swings
    ±0.2 — so the assertion is an averaged floor, not an ordering."""
    encoded = pq_encode(emb, trained).cache()
    recalls = []
    for qid in [0, 1, 2, 3, 4]:
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first().embedding
        ]
        qlit = F.array(*[F.lit(x) for x in qv])
        exact = [
            r.vec_id
            for r in emb.filter(F.col("vec_id") != qid)
            .select(
                "vec_id",
                _fsq_l2(
                    F.col("embedding").cast("array<double>"), qlit
                ).alias("d"),
            )
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        ]
        got = [
            r.vec_id
            for r in pq_adc_topk(
                encoded.filter(F.col("vec_id") != qid), trained, qv, top_k=50
            ).collect()
        ]
        recalls.append(len(set(got) & set(exact)) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.4, recalls
