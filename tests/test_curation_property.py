"""Property test: sequence packing vs an independent Python model on
arbitrary corpora — token conservation, budget invariant, and
shard-local determinism hold for any document mix (empty docs,
single-word docs, docs bigger than the budget)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qms_datawarehouse_spark.operators.curation import pack_sequences

doc_strategy = st.lists(
    st.integers(min_value=1, max_value=40),  # words per doc
    min_size=1,
    max_size=60,
)


def _model(token_counts: dict[int, int], budget: int, n_shards: int):
    """Independent greedy concat-and-chunk: per shard, docs in doc_id
    order, seq = floor(tokens-before-this-doc / budget)."""
    shards: dict[int, list[int]] = {}
    for doc_id in sorted(token_counts):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        shards.setdefault((h % 10000) % n_shards, []).append(doc_id)
    expect = {}
    for shard, ids in shards.items():
        cum = 0
        for doc_id in ids:
            expect[doc_id] = (shard, cum // budget)
            cum += token_counts[doc_id]
    return expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(word_counts=doc_strategy, budget=st.sampled_from([8, 32, 128]))
def test_packing_matches_model(spark, word_counts, budget):
    rows = [
        (i, " ".join(["w"] * n), "en") for i, n in enumerate(word_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = pack_sequences(df, budget=budget, n_shards=4).collect()

    token_counts = {i: n for i, n in enumerate(word_counts)}
    expect = _model(token_counts, budget, 4)

    assert len(out) == len(rows)  # every doc lands in exactly one seq
    for r in out:
        assert (r.shard, r.seq_id) == expect[r.doc_id], r
    # token conservation: sum over sequences == sum over docs
    assert sum(r.n_tokens for r in out) == sum(word_counts)


# --------------------------------------------------------------------
# text_repetition vs an independent Python model
# --------------------------------------------------------------------

words_strategy = st.lists(
    st.sampled_from(["a", "b", "c", "d", "aa", "bb"]),
    min_size=1,
    max_size=30,
)


def _rep_model(words: list[str]) -> dict:
    from collections import Counter

    def grams(n):
        return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]

    uni = Counter(grams(1))
    bi = Counter(grams(2))
    tri = Counter(grams(3))
    total1 = sum(uni.values())
    out = {
        "n_words": total1,
        "dup_word_bp": (total1 - len(uni)) * 10000 // total1,
        "top_bigram_bp": 0,
        "dup_trigram_bp": 0,
    }
    if bi:
        out["top_bigram_bp"] = max(bi.values()) * 10000 // sum(bi.values())
    if tri:
        dup = sum(c for c in tri.values() if c > 1)
        out["dup_trigram_bp"] = dup * 10000 // sum(tri.values())
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(words_strategy, min_size=1, max_size=6))
def test_repetition_matches_model(spark, docs, tmp_path_factory):
    import os
    import tempfile

    from qms_datawarehouse_spark.plans.registry import REGISTRY

    rows = [
        (i, " ".join(ws), "en", "s", len(" ".join(ws)))
        for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tempfile.mkdtemp()
    df.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in REGISTRY["text_repetition"].fn(spark, d).collect()}
    assert set(out) == set(range(len(docs)))
    for i, ws in enumerate(docs):
        exp = _rep_model(ws)
        got = out[i]
        assert got.n_words == exp["n_words"], (i, ws)
        assert got.dup_word_bp == exp["dup_word_bp"], (i, ws)
        assert got.top_bigram_bp == exp["top_bigram_bp"], (i, ws)
        assert got.dup_trigram_bp == exp["dup_trigram_bp"], (i, ws)


# --------------------------------------------------------------------
# domain_mix vs an independent Python model
# --------------------------------------------------------------------


def _mix_model(docs, budgets, default_budget):
    """Greedy per-source admission in (md5-priority, doc_id) order."""
    by_src = {}
    for doc_id, n_toks, src in docs:
        pri = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10000
        by_src.setdefault(src, []).append((pri, doc_id, n_toks))
    admitted = {}
    for src, rows in by_src.items():
        budget = budgets.get(src, default_budget)
        cum = 0
        for pri, doc_id, n_toks in sorted(rows):
            cum += n_toks
            if cum <= budget:
                admitted[doc_id] = cum
    return admitted


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
    budget=st.sampled_from([30, 100, 400]),
)
def test_domain_mix_matches_model(spark, sizes, budget):
    from qms_datawarehouse_spark.operators.curation import domain_mix

    docs = [(i, n, f"src{i % 3}") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "en", s) for i, n, s in docs],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r.cum_toks for r in
           domain_mix(df, {"src0": budget * 2}, default_budget=budget).collect()}
    expect = _mix_model(docs, {"src0": budget * 2}, budget)
    assert out == expect
