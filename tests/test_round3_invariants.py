"""Cross-cutting invariants for the round-3 operators — properties
the per-query oracles can't state (determinism across runs,
conservation laws between queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import REGISTRY, tables

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR).collect()


def test_passage_counts_conserve_chunks(spark):
    """Σ n_passages over the output == Σ ⌊n_words/10⌋ over the corpus
    (no passage lost or double-counted by the hash join)."""
    (documents,) = tables(spark, SF_DIR, "documents")
    expect = (
        documents.select(
            F.floor(F.size(F.split("text", " ", -1)) / 10).alias("c")
        )
        .agg(F.sum("c"))
        .first()[0]
    )
    got = sum(r.n_passages for r in _rows(spark, "dedup_passages"))
    assert got == expect


def test_tfidf_ranks_are_dense_per_doc(spark):
    by_doc = {}
    for r in _rows(spark, "text_tfidf_topk"):
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        ranks = sorted(r.rk for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), doc_id
        assert len(rs) <= 5
        # scores non-increasing in rank
        by_rank = sorted(rs, key=lambda r: r.rk)
        scores = [r.score_ppm for r in by_rank]
        assert scores == sorted(scores, reverse=True), doc_id


def test_shuffle_shards_is_deterministic_and_total(spark):
    a = sorted(map(tuple, _rows(spark, "curation_shuffle_shards")))
    b = sorted(map(tuple, _rows(spark, "curation_shuffle_shards")))
    assert a == b  # same permutation every run — restartable exports
    (documents,) = tables(spark, SF_DIR, "documents")
    assert sum(r[1] for r in a) == documents.count()  # partition, no loss
    assert all(0 <= r[0] < 8 for r in a)


def test_repeat_upsample_conserves_weighted_counts(spark):
    (documents,) = tables(spark, SF_DIR, "documents")
    per_source = {
        r.source: r.n
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    weights = {"src0": 3, "src1": 2}
    for r in _rows(spark, "curation_repeat_upsample"):
        w = weights.get(r.source, 1)
        assert r.n_rows == per_source[r.source] * w, r.source
        assert r.n_docs == per_source[r.source]
        assert r.max_epoch == w - 1


def test_canonical_members_partition_the_corpus(spark):
    """Every doc belongs to exactly one cluster; canonical docs are
    members of their own cluster with the max length."""
    rows = _rows(spark, "dedup_canonical")
    (documents,) = tables(spark, SF_DIR, "documents")
    assert sum(r.n_members for r in rows) == documents.count()
    chars = {r.doc_id: r.n_chars for r in documents.select("doc_id", "n_chars").collect()}
    for r in rows:
        assert chars[r.canonical_doc] == r.canonical_chars
        assert r.canonical_doc >= r.cluster_id  # cluster_id is the min member


def test_ivfpq_probe_subset_of_cells(spark):
    """Every returned candidate's cell must be one of ≤ N_PROBE
    distinct cells (the probe prune actually pruned)."""
    from qms_datawarehouse_spark.operators.pq import IVFPQ_N_PROBE

    rows = _rows(spark, "similarity_ivfpq")
    assert len(rows) == 10
    assert len({r.cell_id for r in rows}) <= IVFPQ_N_PROBE
    adcs = [r.adc for r in rows]
    assert adcs == sorted(adcs)
