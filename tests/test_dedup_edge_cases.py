"""Short-document edge cases for the shingle pipeline.

Docs with fewer than 3 words must yield EMPTY shingle arrays (the
DuckDB oracle's end-exclusive ``range`` does this naturally); the
Spark side previously built a descending ``sequence(1, 0)`` and
crashed in ``slice(w, 0, 3)``.
"""

from __future__ import annotations

import duckdb
import pytest

from qms_datawarehouse_spark.operators.dedup import _shingled


@pytest.fixture(scope="module")
def short_docs(spark):
    rows = [
        (1, ""),
        (2, "one"),
        (3, "two words"),
        (4, "three word doc"),
        (5, "a four word document"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_do_not_crash(short_docs):
    out = {r["doc_id"]: r["shingles"] for r in _shingled(short_docs).collect()}
    assert out[1] == []
    assert out[2] == []
    assert out[3] == []
    assert out[4] == ["three word doc"]
    assert out[5] == ["a four word", "four word document"]


def test_short_docs_match_oracle(short_docs):
    """Spark shingles == DuckDB-oracle shingles for every doc length."""
    spark_out = {
        r["doc_id"]: sorted(r["shingles"]) for r in _shingled(short_docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(1, ""), (2, "one"), (3, "two words"), (4, "three word doc"), (5, "a four word document")],
    )
    oracle = con.execute(
        """
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(string_split(lower(text), ' ')) - 1, 1)),
                   i -> array_to_string(
                       list_slice(string_split(lower(text), ' '), i, i + 2), ' ')
               )) AS shingles
        FROM documents
        """
    ).fetchall()
    oracle_out = {doc_id: sorted(sh) for doc_id, sh in oracle}
    assert spark_out == oracle_out


def test_connected_components_string_ids(spark):
    """String node ids must propagate to full convergence — the
    numeric monotone-sum convergence shortcut does not apply and a
    silent wrong-type sum previously could terminate early."""
    from qms_datawarehouse_spark.operators.dedup import connected_components

    # a 4-chain: full propagation needs >1 round; plus an isolate
    nodes = spark.createDataFrame(
        [("d",), ("c",), ("b",), ("a",), ("z",)], "doc string"
    )
    edges = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a")], "a string, b string"
    )
    out = {r["doc"]: r["cluster_id"] for r in
           connected_components(nodes, edges, id_col="doc").collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}


def test_connected_components_numeric_ids(spark):
    from qms_datawarehouse_spark.operators.dedup import connected_components

    nodes = spark.range(6).toDF("doc")
    edges = spark.createDataFrame([(5, 4), (4, 3), (1, 0)], "a long, b long")
    out = {r["doc"]: r["cluster_id"] for r in
           connected_components(nodes, edges, id_col="doc").collect()}
    assert out == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3, 5: 3}
