"""Round-8 hardening pins: the r7 ADVICE-flagged failure modes plus
the new round-8 operators' cross-engine invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_ingest_semantic_caps_rejected_report(spark, warehouse):
    """A batch of mutual near-dups must NOT collect O(pairs) tuples to
    the driver: the ``rejected`` report is a deterministic prefix of
    ``max_rejects`` pairs with ``rejects_truncated`` set, while
    ``n_rejected`` stays the exact uncapped distinct-id count
    (mirrors incremental_dedup.ingest_dedup)."""
    from qms_datawarehouse_spark.operators.semantic_gate import (
        ingest_semantic,
    )

    # 12 identical unit vectors: every (lower-id, higher-id) pair is a
    # near-dup, so ids 1..11 are all rejected against id 0
    dim = 8
    rows = [(i, [1.0 / (dim ** 0.5)] * dim) for i in range(12)]
    batch = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = ingest_semantic(warehouse, batch, max_rejects=3)
    assert capped.n_rejected == 11  # exact, not the capped 3
    assert capped.n_accepted == 1
    assert len(capped.rejected) == 3
    assert capped.rejects_truncated
    # deterministic prefix: first 3 pairs in (new_id, old_id) order
    assert capped.rejected == sorted(capped.rejected)

    # uncapped run on a fresh warehouse sees every pair, no flag
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    wh2 = ParquetWarehouse(spark, warehouse.root + "_uncapped")
    full = ingest_semantic(wh2, batch, max_rejects=None)
    assert full.n_rejected == 11
    assert not full.rejects_truncated
    assert capped.rejected == full.rejected[:3]


def test_tmputil_reaps_legacy_non_pid_dirs(tmp_path, monkeypatch):
    """Pre-pid-isolation leftovers (a bare sf0.001/ under the family
    root) must be swept — they are exactly what once masked a test
    validating a stale layout instead of the one just written."""
    import tempfile

    from qms_datawarehouse_spark.tmputil import pid_scoped_dir

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    legacy = tmp_path / "fam" / "sf0.001" / "orders"
    legacy.mkdir(parents=True)
    (legacy / "part-0.parquet").write_bytes(b"x")
    out = pid_scoped_dir("fam", "sf0.001", "orders")
    assert not (tmp_path / "fam" / "sf0.001").exists()
    assert str(tmp_path / "fam") in out and str(os.getpid()) in out


def test_semdedup_scaled_equals_fixed_k_at_floor(spark):
    """At the K floor (n//64 < 8 on the sf0.001 fixture, contiguous
    ids from 0) the K∝N row must be value-identical to dedup_semantic
    — same seeds, same Lloyd iterations, same prune/keep policy."""
    from qms_datawarehouse_spark.operators.similarity import (
        dedup_semantic,
        dedup_semantic_scaled,
    )

    sf = "/root/testdata/sf0.001"
    fixed = {tuple(r) for r in dedup_semantic(spark, sf).collect()}
    scaled = {tuple(r) for r in dedup_semantic_scaled(spark, sf).collect()}
    assert fixed == scaled


def test_km_scaled_k_grows_with_n():
    from qms_datawarehouse_spark.operators.kmeans_core import (
        _KM_CELL,
        _KM_K,
        km_scaled_k,
    )

    assert km_scaled_k(0) == _KM_K
    assert km_scaled_k(500) == _KM_K  # the sf0.01 fixture stays at 8
    assert km_scaled_k(2000) == 2000 // _KM_CELL  # sf0.1 → 31
    assert km_scaled_k(20_000) == 20_000 // _KM_CELL  # 10x → 312


def _py_greedy_merge(s, a, b):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


@pytest.mark.parametrize(
    "syms,a,b",
    [
        (["a", "b", "a", "b", "a"], "a", "b"),  # adjacent sites
        (["a", "a", "a"], "a", "a"),  # odd run
        (["a", "a", "a", "a"], "a", "a"),  # even run
        (["ab", "b", "a", "b"], "a", "b"),  # multi-char left context
        (["x"], "a", "b"),  # single symbol
        (["b", "a"], "a", "b"),  # pair present only reversed
        (["aa", "a", "a", "aa"], "a", "a"),  # run bounded by merged
    ],
)
def test_bpe_fold_matches_greedy_reference(spark, syms, a, b):
    """The string-accumulator fold IS canonical greedy left-to-right
    BPE: pin it against the independent Python two-pointer scan on
    the overlap shapes where a naive string replace diverges."""
    from qms_datawarehouse_spark.operators.textops import _bpe_fold_sql

    df = spark.createDataFrame([(syms,)], "l array<string>")
    fold = _bpe_fold_sql("l", f"'{a}'", f"'{b}'", str(len(a)))
    got = df.selectExpr(f"{fold} AS m").first()["m"]
    assert got == " ".join(_py_greedy_merge(syms, a, b))


def test_bpe_training_is_deterministic_and_compresses():
    from qms_datawarehouse_spark.operators.textops import _train_bpe

    words = [("banana", 3), ("bandana", 2), ("nab", 5)]
    m1 = _train_bpe(words, 6)
    m2 = _train_bpe(list(words), 6)
    assert m1 == m2 and len(m1) == 6
    # round 1: pair counts — an:5, na:5(banana x2... weighted), ab:5,
    # ba:5, nd:2, da:2; ties break on the lexicographically smallest
    # 'A B' string among the max-count pairs
    cnt = {}
    for w, n in words:
        for i in range(len(w) - 1):
            cnt[(w[i], w[i + 1])] = cnt.get((w[i], w[i + 1]), 0) + n
    best = min(cnt, key=lambda p: (-cnt[p], p[0] + " " + p[1]))
    assert m1[0] == best


def test_bpe_encode_chain_matches_python_pipeline(spark):
    """Property: for random word multisets, the Spark nested-fold
    encode chain (built from _train_bpe's merges) produces exactly
    the piece sequences a pure-Python greedy application of the same
    merges produces — the cross-implementation pin UNDER the oracle
    (which re-derives the merges independently in SQL)."""
    import random

    from qms_datawarehouse_spark.operators.textops import (
        _bpe_fold_sql,
        _train_bpe,
    )
    from pyspark.sql import functions as F

    rng = random.Random(8)
    alphabet = "abcd"  # tiny alphabet → dense pair collisions
    for trial in range(4):
        words = sorted(
            {
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 9))
                )
                for _ in range(rng.randint(5, 30))
            }
        )
        freqs = [(w, rng.randint(1, 9)) for w in words]
        merges = _train_bpe(freqs, 8)

        def py_encode(w):
            s = list(w)
            for a, b in merges:
                s = _py_greedy_merge(s, a, b)
            return s

        expr = "split(trim(regexp_replace(word, '(.)', '$1 ')), ' ')"
        for a, b in merges:
            folded = _bpe_fold_sql(expr, f"'{a}'", f"'{b}'", str(len(a)))
            expr = f"split({folded}, ' ')"
        df = spark.createDataFrame([(w,) for w in words], "word string")
        got = {
            r["word"]: r["p"]
            for r in df.select(
                "word", F.expr(f"array_join({expr}, ' ')").alias("p")
            ).collect()
        }
        want = {w: " ".join(py_encode(w)) for w in words}
        assert got == want, f"trial {trial}: {merges}"


def test_tri_width_python_matches_oracle_case_chain():
    """The adaptive LSH bucket width must be identical in the Python
    derivation and the oracle's integer CASE chain — across the
    boundary values where an off-by-one silently shifts every bucket
    key and the driver hash with it."""
    import duckdb

    from qms_datawarehouse_spark.operators.graph import (
        _TRI_MAX_BITS,
        _TRI_MIN_BITS,
        _TRI_OCC,
        _tri_width,
        _tri_width_sql,
    )

    assert _tri_width(0) == _TRI_MIN_BITS
    assert _tri_width(500) == 8  # the sf0.01 fixture
    assert _tri_width(2000) == 9  # the sf0.1 fixture
    assert _tri_width(10**9) == _TRI_MAX_BITS
    con = duckdb.connect()
    probes = [0, 1, 500, 2000, 20000, 10**9] + [
        (1 << w) * _TRI_OCC + d
        for w in range(_TRI_MIN_BITS, _TRI_MAX_BITS + 1)
        for d in (-1, 0, 1)
    ]
    for n in probes:
        got = con.sql(f"SELECT {_tri_width_sql(str(n))}").fetchone()[0]
        assert got == _tri_width(n), n
