"""Round-7 hardening pins: the ADVICE-flagged failure modes must fail
LOUDLY (or degrade gracefully) instead of surfacing as unexplained
driver hash mismatches."""

from __future__ import annotations

import datetime

import pytest

from qms_datawarehouse_spark.operators.incremental_dedup import ingest_dedup
from qms_datawarehouse_spark.operators.similarity import _km_quantized

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the morning sun light"
)


def test_bench_embeds_host_load_telemetry():
    """bench.py's JSON line must carry the contamination indicator
    (loadavg + uptime) so a loaded-box capture is self-diagnosing in
    BENCH_r{N}.json instead of needing a SURVEY cross-reference."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", "/root/repo/bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    hl = bench._host_load()
    assert {"loadavg_1m", "loadavg_5m", "loadavg_15m"} <= set(hl)
    assert hl["uptime_sec"] > 0 and hl["cpus_configured"] > 0


def test_km_quantized_guards_out_of_range_components(spark):
    """The shift-positive fixed-point contract (every component
    > -1.0) is what keeps Spark ``div`` and DuckDB ``//`` byte-equal
    in the centroid update; a violating embedding must raise with the
    offending vec_id, not silently diverge cross-engine."""
    ok = spark.createDataFrame(
        [(1, [0.5, -0.2]), (2, [-0.9999, 0.3])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r.v for r in _km_quantized(ok).collect()}
    assert rows == {1: [1500, 800], 2: [0, 1300]}

    bad = spark.createDataFrame(
        [(7, [0.5, -1.5])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="vec_id=7"):
        _km_quantized(bad).collect()


def test_capped_report_never_double_lists_in_batch_rejects(spark, warehouse):
    """The cross-corpus report filter must see the FULL in-batch dup
    id set (built from the frame, not the capped report prefix): a doc
    rejected in-batch that also near-matches a stored doc appears in
    the report once, under its in-batch pairing."""
    ingest_dedup(
        warehouse,
        spark.createDataFrame([(1, BASE)], "doc_id long, text string"),
    )
    batch = spark.createDataFrame(
        [
            (40, BASE.replace("morning", "evening")),
            (41, BASE.replace("morning", "midnight")),
        ],
        "doc_id long, text string",
    )
    res = ingest_dedup(warehouse, batch, max_rejects=5)
    assert res.n_accepted == 0 and res.n_rejected == 2
    # 41 rejects to 40 in-batch; both near-match stored doc 1. The
    # report lists 41 exactly once (in-batch) and 40 once (cross).
    new_ids = [r[0] for r in res.rejected]
    assert sorted(new_ids) == [40, 41]
    assert (41, 40) in {(r[0], r[1]) for r in res.rejected}


def test_dedup_semantic_shares_kmeans_partition(spark):
    """dedup_semantic's clusters ARE embedding_kmeans_2iter's clusters
    (one shared Lloyd stage): member counts must agree per cluster,
    and the keep/remove accounting must balance."""
    from qms_datawarehouse_spark.operators.similarity import (
        dedup_semantic,
        embedding_kmeans_2iter,
    )
    from conftest import SF_DIR

    sem = {r.cluster_id: r for r in dedup_semantic(spark, SF_DIR).collect()}
    km = {
        r.cluster_id: r.n_members
        for r in embedding_kmeans_2iter(spark, SF_DIR).collect()
    }
    assert {c: r.n_members for c, r in sem.items()} == km
    for r in sem.values():
        assert r.n_kept + r.n_removed == r.n_members
        assert r.n_dup_pairs >= r.n_removed  # every removal has >=1 pair
        assert (r.removed_id_sum > 0) == (r.n_removed > 0)


def test_substring_spans_merges_runs_and_catches_straddles(spark, tmp_path):
    """Two shared regions separated by more than k tokens form TWO
    maximal spans with exact token coverage; a shared region that
    straddles dedup_passages' fixed 10-token chunk grid is still
    caught (the stride-1 point of the operator)."""
    from qms_datawarehouse_spark.operators.dedup import (
        _SPAN_K,
        dedup_substring_spans,
    )

    k = _SPAN_K
    base = [f"w{i}" for i in range(120)]
    # doc 1 shares base[9:39] (30 tokens) and base[70:96] (26 tokens)
    # with doc 0 — deliberately NOT aligned to any 10-token grid
    doc0 = " ".join(base)
    doc1 = " ".join(
        [f"x{i}" for i in range(7)]
        + base[9:39]
        + [f"y{i}" for i in range(k + 5)]
        + base[70:96]
    )
    spark.createDataFrame(
        [(0, doc0), (1, doc1)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    for did in (0, 1):
        r = out[did]
        assert r.n_spans == 2, r
        assert r.covered_tokens == 30 + 26, r
        # 30-token region -> 11 grams, 26-token region -> 7 grams
        assert r.n_dup_grams == (30 - k + 1) + (26 - k + 1), r
    assert out[0].n_tokens == 120 and out[0].dup_bp == 56 * 10000 // 120


def _late_replay_fixture(spark):
    """The replay query's own event split at SF_DIR, as DataFrames the
    real paths can consume: (epoch-1 frame, full-snapshot frame,
    model rows keyed by mode)."""
    from qms_datawarehouse_spark.plans.registry import tables
    from qms_datawarehouse_spark.streaming.windows import (
        watermark_late_replay,
    )
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    (events,) = tables(spark, SF_DIR, "events")
    ev = events.select(
        F.col("event_id").alias("_id"),
        F.date_trunc("hour", "ts").alias("cur"),
        (F.pmod(F.col("event_id"), F.lit(10)) < 7).alias("in_e1"),
    )
    model = {
        r.mode: r for r in watermark_late_replay(spark, SF_DIR).collect()
    }
    return ev, model


def test_late_replay_gt_and_ge_match_real_sync_epochs(spark, warehouse):
    """The replay's gt / ge_dedup rows must equal TWO REAL
    sync_dataframe epochs through a warehouse: records_synced pins
    n_delta_rows, the stored id set pins n_epoch1 + n_new_ids and
    stored_id_sum — the T4/T5 admission math is the live path's, not
    a parallel reimplementation."""
    from qms_datawarehouse_spark.config import Settings
    from qms_datawarehouse_spark.engine import sync_dataframe
    from pyspark.sql import functions as F

    ev, model = _late_replay_fixture(spark)
    for mode in ("gt", "ge_dedup"):
        coll = f"ev_{mode}"
        e1 = ev.filter("in_e1").drop("in_e1")
        full = ev.drop("in_e1")
        s = Settings(delta_mode=mode)
        r1 = sync_dataframe(
            warehouse, e1, "late_src", coll, cursor_col="cur", settings=s
        )
        r2 = sync_dataframe(
            warehouse, full, "late_src", coll, cursor_col="cur", settings=s
        )
        row = model[mode]
        assert r1.records_synced == row.n_epoch1
        assert r2.records_synced == row.n_delta_rows, mode
        stored = warehouse.read(coll).select(
            F.col("_id").cast("long").alias("id")
        )
        agg = stored.agg(
            F.count("*").alias("n"), F.sum("id").alias("s")
        ).first()
        assert agg["n"] == row.n_epoch1 + row.n_new_ids, mode
        assert agg["s"] == row.stored_id_sum, mode


def test_late_replay_watermark_matches_real_stream(spark, tmp_path):
    """The watermark_24h row must equal a REAL two-batch readStream
    with withWatermark + streaming dropDuplicates: batch 2's admitted
    row count is exactly the model's n_new_ids (rows with event time
    older than max(batch-1 event time) - 24h are dropped by the
    engine, not by our arithmetic)."""
    ev, model = _late_replay_fixture(spark)
    b1 = str(tmp_path / "b1")
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    import os
    import shutil

    os.makedirs(src)
    ev.filter("in_e1").drop("in_e1").write.parquet(b1)
    for f in os.listdir(b1):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(b1, f), os.path.join(src, "a_" + f))

    out = str(tmp_path / "admitted")

    def run():
        q = (
            spark.readStream.schema("_id long, cur timestamp")
            .parquet(src)
            .withWatermark("cur", "24 hours")
            .dropDuplicates(["_id"])
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(out).count()

    n1 = run()
    row = model["watermark_24h"]
    assert n1 == row.n_epoch1
    # epoch 2: the remaining 30% arrive late, in a second trigger
    b2 = str(tmp_path / "b2")
    ev.filter("NOT in_e1").drop("in_e1").write.parquet(b2)
    for f in os.listdir(b2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(b2, f), os.path.join(src, "b_" + f))
    n2 = run()
    assert n2 - n1 == row.n_new_ids


def test_semantic_gate_replay_matches_two_real_ingest_calls(spark, warehouse):
    """semantic_gate_replay_two_epochs is the semantic ingest gate's
    admission math as a stateless program; pin it equal to TWO REAL
    ingest_semantic calls through a warehouse on the same parity
    split."""
    from qms_datawarehouse_spark.operators.semantic_gate import (
        CELL_COL,
        CORPUS_TABLE,
        ingest_semantic,
        semantic_gate_replay_two_epochs,
    )
    from qms_datawarehouse_spark.plans.registry import tables
    from conftest import SF_DIR
    from pyspark.sql import functions as F

    (emb,) = tables(spark, SF_DIR, "embeddings")
    e1 = emb.filter(F.expr("pmod(vec_id, 2) = 0"))
    e2 = emb.filter(F.expr("pmod(vec_id, 2) = 1"))
    r1 = ingest_semantic(warehouse, e1)
    r2 = ingest_semantic(warehouse, e2)
    # the fixture must exercise the gate: both epochs reject something
    assert r1.n_rejected > 0 and r2.n_rejected > 0
    assert r1.n_batch == r1.n_accepted + r1.n_rejected

    replay = semantic_gate_replay_two_epochs(spark, SF_DIR).collect()
    assert sum(r.n_stored_e1 for r in replay) == r1.n_accepted
    assert sum(r.n_stored_e2 for r in replay) == r2.n_accepted
    stored = warehouse.read(CORPUS_TABLE)
    per_cell = {
        r[CELL_COL]: (r["n"], r["s"])
        for r in stored.groupBy(CELL_COL)
        .agg(F.count("*").alias("n"), F.sum("vec_id").alias("s"))
        .collect()
    }
    for row in replay:
        n, s = per_cell.get(row.cell, (0, 0))
        assert n == row.n_stored_e1 + row.n_stored_e2, row
        assert s == row.stored_id_sum, row


def test_bloom_lookup_survives_degenerate_key_domain(spark, tmp_path):
    """A key domain where no key satisfies 2k <= max(k) makes the
    mid-key aggregate NULL; the lookup must fall back to lo instead of
    raising TypeError (the DuckDB oracle already degrades via a UNION
    of an empty select)."""
    from qms_datawarehouse_spark.sources.bloomindex import (
        bloom_index_point_lookup,
    )

    d = datetime.date(2024, 1, 1)
    spark.createDataFrame(
        [(5, 1, 10.0, d), (9, 2, 20.0, d)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate date",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = bloom_index_point_lookup(spark, str(tmp_path))
    # keys probed: lo=5 (also the mid fallback), hi=9, absent 10
    assert [r.o_orderkey for r in out.collect()] == [5, 9]


def test_fileskip_routed_scan_actually_prunes(spark):
    """The driver row must exercise the PRUNING path, not the
    conservative keep-all fallback: on the range-partitioned layout
    it writes, a bottom-eighth key predicate keeps <= 1/4 of the
    files (typically 2 of 16). Keep-all would still be value-correct
    — which is exactly why it needs a pin."""
    import pyspark.sql.functions as F

    from qms_datawarehouse_spark.sources.fileskip import (
        _ROUTED_FILES,
        fileskip_routed_scan,
        file_manifest_df,
        prune_files_df,
    )

    from qms_datawarehouse_spark.tmputil import pid_scoped_dir

    sf_dir = "/root/testdata/sf0.001"
    fileskip_routed_scan(spark, sf_dir).collect()  # writes the layout
    # same derivation the operator uses — never a hardcoded literal
    # (the pre-pid-isolation path masked this once: a stale layout in
    # /tmp let the old literal pass while validating nothing)
    path = pid_scoped_dir("qms_fileskip_routed", "sf0.001", "orders")
    man = file_manifest_df(spark, path, ["o_orderkey"])
    lo_hi = (
        spark.read.parquet(path)
        .agg(F.min("o_orderkey"), F.max("o_orderkey"))
        .first()
    )
    lo, hi = int(lo_hi[0]), int(lo_hi[1])
    files = prune_files_df(man, "o_orderkey", lo, lo + (hi - lo) // 8)
    assert len(files) <= _ROUTED_FILES // 4


def test_chunking_covers_every_token_exactly(spark):
    """Chunk intervals must tile each document: contiguous 0-based
    chunk_idx on a 48-token stride, last chunk clipped to the tail,
    max covered position == the doc's token count."""
    import pyspark.sql.functions as F

    from qms_datawarehouse_spark.operators.textops import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        text_chunking,
    )

    ch = text_chunking(spark, "/root/testdata/sf0.001")
    bad_start = ch.filter(
        F.col("start_tok") != F.col("chunk_idx") * _CHUNK_STRIDE + 1
    ).count()
    assert bad_start == 0
    per_doc = ch.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tokens") - 1).alias("covered"),
        F.count("*").alias("n_chunks"),
        (F.max("chunk_idx") + 1).alias("max_idx1"),
    )
    assert per_doc.filter(F.col("n_chunks") != F.col("max_idx1")).count() == 0
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_words = docs.select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n")
    )
    j = per_doc.join(n_words, "doc_id")
    assert j.filter(F.col("covered") != F.col("n")).count() == 0
    # a chunk is full-size iff its window fits before the doc tail
    # (size > stride, so the last TWO chunks may both be clipped)
    sized = ch.join(n_words, "doc_id").filter(
        F.col("start_tok") + _CHUNK_SIZE - 1 <= F.col("n")
    )
    assert sized.filter(F.col("n_tokens") != _CHUNK_SIZE).count() == 0


def test_tokenize_vocab_ids_dense_and_oov_consistent(spark):
    """Vocabulary ids must be exactly 0..V-1 (dense, deterministic);
    per-doc OOV never exceeds token count; a doc of pure vocabulary
    words has oov_bp == 0."""
    import pyspark.sql.functions as F

    from qms_datawarehouse_spark.operators.textops import text_tokenize_ids

    out = text_tokenize_ids(spark, "/root/testdata/sf0.001")
    assert out.filter(F.col("n_oov") > F.col("n_tokens")).count() == 0
    assert out.filter(
        (F.col("oov_bp") < 0) | (F.col("oov_bp") > 10000)
    ).count() == 0


def test_pagerank_conserves_mass_within_truncation(spark):
    """Two damped iterations from uniform over a graph with no
    dangling nodes keep total mass within integer-truncation loss of
    the initial 10^12 (each division drops < 1 unit per operand);
    every rank is positive."""
    import pyspark.sql.functions as F

    from qms_datawarehouse_spark.operators.graph import (
        _MASS,
        graph_pagerank_2iter,
    )

    top = graph_pagerank_2iter(spark, "/root/testdata/sf0.001")
    rows = top.collect()
    assert len(rows) == 20
    assert all(r["rank_mass"] > 0 and r["degree"] > 0 for r in rows)
    # ranks are sorted desc with the orderkey tiebreak
    masses = [r["rank_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    # top-20 can't exceed the total mass budget
    assert sum(masses) <= _MASS
