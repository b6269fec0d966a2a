"""Edge cases + oracle cross-check for the round-3 text/dedup
queries: text_tfidf_topk, text_top_bigrams, dedup_passages.

The hostile inputs are document lengths around the chunk/zip
boundaries: empty text, single word, exactly 10 words, 10+partial.
Spark's ``sequence(0, -1)`` counts DOWN (yields [0, -1]) — the same
descending-sequence trap the shingle kernel hit (see
test_dedup_edge_cases.py) — so a sub-10-word doc must be guarded to
yield zero passages, matching DuckDB's end-exclusive ``range(0)``.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from qms_datawarehouse_spark.plans.registry import REGISTRY

TEN = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"


@pytest.fixture(scope="module")
def corpus_dir(spark):
    rows = [
        (1, "", "en", "s", 0),
        (2, "one", "en", "s", 3),
        (3, TEN, "en", "s", len(TEN)),                     # exactly 1 chunk
        (4, TEN + " tail", "en", "s", 0),                  # 1 chunk + partial
        (5, TEN + " " + TEN, "en", "s", 0),                # 2 chunks, chunk1 dup of doc 3
        (6, "a b c d e f g h i", "en", "s", 0),            # 9 words: 0 chunks
    ]
    spark_df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    spark_df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def _oracle(corpus_dir, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(corpus_dir, 'documents.parquet')}/*.parquet')"
    )
    return con.execute(REGISTRY[name].sql).fetchall()


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize(
    "name", ["dedup_passages", "text_top_bigrams", "text_tfidf_topk"]
)
def test_matches_oracle_on_boundary_corpus(spark, corpus_dir, name):
    spark_rows = [tuple(r) for r in REGISTRY[name].fn(spark, corpus_dir).collect()]
    assert _norm(spark_rows) == _norm(_oracle(corpus_dir, name))


def test_passage_counts(spark, corpus_dir):
    out = {
        r.doc_id: r
        for r in REGISTRY["dedup_passages"].fn(spark, corpus_dir).collect()
    }
    # docs 1, 2, 6 (<10 words) yield no passage rows at all
    assert set(out) == {3, 4, 5}
    assert out[3].n_passages == 1 and out[3].n_dup_passages == 1
    assert out[4].n_passages == 1 and out[4].n_dup_passages == 1  # partial tail dropped
    assert out[5].n_passages == 2 and out[5].n_dup_passages == 2
    assert out[5].dup_bp == 10000


def test_bigram_edge_lengths(spark, corpus_dir):
    rows = REGISTRY["text_top_bigrams"].fn(spark, corpus_dir).collect()
    pairs = {(r.w1, r.w2): (r.n, r.n_docs) for r in rows}
    # "w9 w0" occurs only at the doc-5 chunk seam; ("w0","w1") in docs 3,4,5(×2)
    assert pairs[("w0", "w1")] == (4, 3)
    assert pairs[("w9", "w0")] == (1, 1)
    # single-word and empty docs contribute no bigrams, and no crash
    assert all(n >= 1 for n, _ in pairs.values())
