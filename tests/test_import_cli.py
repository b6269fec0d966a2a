"""dump.py-parity CLI: sniff, skip malformed, destructive reload,
verified count."""

from __future__ import annotations

import json
import sys


def test_import_cli_roundtrip(spark, tmp_path, capsys, monkeypatch):
    sys.path.insert(0, "tools")
    import import_json

    nd = tmp_path / "t.ndjson"
    nd.write_text(
        json.dumps({"_id": "1", "name": "a"}) + "\n"
        + "{broken\n"
        + json.dumps({"_id": "2", "name": "ወረፋ"}, ensure_ascii=False) + "\n",
        encoding="utf-8",
    )
    arr = tmp_path / "u.json"
    arr.write_text(json.dumps([{"_id": "x"}, {"_id": "y"}, {"_id": "z"}]))

    # reuse the session-scoped spark (get_spark returns the active one)
    rc = import_json.main(
        ["--warehouse", str(tmp_path / "wh"), f"t={nd}", f"u={arr}"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "t: imported 2 records" in out and "skipped 1 malformed" in out
    assert "u: imported 3 records" in out and "(array)" in out

    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    names = {r["name"] for r in wh.read("t").collect()}
    assert names == {"a", "ወረፋ"}


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    import tools.curate as curate

    wh_dir = str(tmp_path / "wh")
    rc = curate.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--warehouse", wh_dir,
            "--out", "curated",
            "--rates", "en=8000,de=5000,es=2500,fr=2500,zh=1000",
            "--normalize", "--redact", "--dedup", "--split",
            "--pack-budget", "2048", "--profile",
            "--master", "local[4]",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "curated curated:" in out and "sequences" in out
    # the profile report printed one line per published column
    assert "profile curated.doc_id:" in out
    assert "profile curated.split:" in out

    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    wh = ParquetWarehouse(spark, wh_dir)
    cur = wh.read("curated")
    assert 0 < cur.count() < 500  # sampling dropped rows
    cols = set(cur.columns)
    assert {"split", "text", "n_emails"} <= cols
    # dedup: content hashes unique
    from pyspark.sql import functions as F

    n = cur.count()
    assert cur.select(F.md5(F.col("text").cast("binary"))).distinct().count() == n
    seqs = wh.read("curated_sequences")
    assert seqs.count() == n  # one row per surviving doc


def test_curate_cli_ingest_gate(spark, tmp_path, capsys):
    import tools.curate as curate

    src = "/root/testdata/sf0.001/documents.parquet"
    wh = str(tmp_path / "wh")
    rc = curate.main(
        ["--input", src, "--warehouse", wh, "--out", "corpus",
         "--ingest-gate", "--master", "local[4]"]
    )
    assert rc == 0
    first = capsys.readouterr().out
    assert "ingest-gated corpus:" in first
    # a second identical run re-admits by id (upsert), adding nothing
    rc = curate.main(
        ["--input", src, "--warehouse", wh, "--out", "corpus",
         "--ingest-gate", "--master", "local[4]"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    import re
    m = re.search(r"curated corpus: \d+ -> (\d+) rows", first)
    m2 = re.search(r"curated corpus: \d+ -> (\d+) rows", out)
    assert m and m2 and m.group(1) == m2.group(1)


def test_curate_cli_phash_gate(spark, tmp_path, capsys):
    """--phash-gate drops image near-dup payloads before publishing,
    maintains the gate's warehouse state, and a replayed run converges
    (keyed upsert: same published row count, nothing re-admitted)."""
    import re

    import tools.curate as curate
    from qms_datawarehouse_spark.operators.phash_gate import (
        CORPUS_TABLE,
        INDEX_TABLE,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    src = "/root/testdata/sf0.001/documents.parquet"
    wh_dir = str(tmp_path / "wh")
    argv = ["--input", src, "--warehouse", wh_dir, "--out", "curated",
            "--phash-gate", "--master", "local[4]"]
    assert curate.main(argv) == 0
    first = capsys.readouterr().out
    m = re.search(
        r"phash-gate: (\d+) payloads, (\d+) admitted, (\d+) image near-dups",
        first,
    )
    assert m, first
    n_batch, n_adm, n_rej = map(int, m.groups())
    assert n_batch == n_adm + n_rej
    assert n_rej > 0  # the fixture has phash near-dup structure

    wh = ParquetWarehouse(spark, wh_dir)
    # published table excludes the rejected payloads
    assert wh.read("curated").count() == 500 - n_rej
    # gate state maintained: hash corpus == admitted, 4 bands each
    assert wh.read(CORPUS_TABLE).count() == n_adm
    assert wh.read(INDEX_TABLE).count() == 4 * n_adm

    # replay: re-sent ids self-pair only with their own stored rows
    # (id-inequality skip) — same published count, same gate state
    assert curate.main(argv) == 0
    out = capsys.readouterr().out
    m2 = re.search(r"curated curated: \d+ -> (\d+) rows", out)
    m1 = re.search(r"curated curated: \d+ -> (\d+) rows", first)
    assert m1 and m2 and m1.group(1) == m2.group(1)
    assert wh.read(CORPUS_TABLE).count() == n_adm


def test_curate_cli_audio_gate(spark, tmp_path, capsys):
    """--audio-gate: the phash-gate contract under the audio kernel —
    rejections counted, gate state in the AUDIO tables, published
    table excludes the rejected payloads."""
    import re

    import tools.curate as curate
    from qms_datawarehouse_spark.operators.phash_gate import (
        AUDIO_CORPUS_TABLE,
        AUDIO_INDEX_TABLE,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    src = "/root/testdata/sf0.001/documents.parquet"
    wh_dir = str(tmp_path / "wh")
    rc = curate.main(
        ["--input", src, "--warehouse", wh_dir, "--out", "curated",
         "--audio-gate", "--master", "local[4]"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    m = re.search(
        r"audio-gate: (\d+) payloads, (\d+) admitted, (\d+) audio near-dups",
        out,
    )
    assert m, out
    n_batch, n_adm, n_rej = map(int, m.groups())
    assert n_batch == n_adm + n_rej and n_rej > 0

    wh = ParquetWarehouse(spark, wh_dir)
    assert wh.read("curated").count() == 500 - n_rej
    assert wh.read(AUDIO_CORPUS_TABLE).count() == n_adm
    assert wh.read(AUDIO_INDEX_TABLE).count() == 4 * n_adm


def test_curate_cli_all_gates_compose(spark, tmp_path, capsys):
    """All three admission gates in ONE run (documented order: phash,
    then audio, then the text MinHash gate): each gate's rejections
    come out of the PREVIOUS gate's survivors, every gate's state
    table ends at exactly its own admitted count, and the published
    row count is the batch minus all three gates' rejections."""
    import re

    import tools.curate as curate
    from qms_datawarehouse_spark.operators.phash_gate import (
        AUDIO_CORPUS_TABLE,
        CORPUS_TABLE as IMG_CORPUS,
    )
    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    src = "/root/testdata/sf0.001/documents.parquet"
    wh_dir = str(tmp_path / "wh")
    rc = curate.main(
        ["--input", src, "--warehouse", wh_dir, "--out", "curated",
         "--phash-gate", "--audio-gate", "--ingest-gate",
         "--master", "local[4]"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    mp = re.search(
        r"phash-gate: (\d+) payloads, (\d+) admitted, (\d+)", out
    )
    ma = re.search(
        r"audio-gate: (\d+) payloads, (\d+) admitted, (\d+)", out
    )
    mt = re.search(
        r"ingest-gated curated: (\d+) in, (\d+) admitted, (\d+)", out
    )
    assert mp and ma and mt, out
    p_batch, p_adm, p_rej = map(int, mp.groups())
    a_batch, a_adm, a_rej = map(int, ma.groups())
    t_batch, t_adm, t_rej = map(int, mt.groups())
    # chained admission: each gate sees only the previous survivors
    assert p_batch == 500
    assert a_batch == p_adm
    assert t_batch == a_adm
    assert p_rej > 0 and a_rej > 0 and t_rej > 0

    wh = ParquetWarehouse(spark, wh_dir)
    # with --ingest-gate the published table IS the text gate's corpus
    assert wh.read("curated").count() == t_adm
    assert wh.read(IMG_CORPUS).count() == p_adm
    assert wh.read(AUDIO_CORPUS_TABLE).count() == a_adm


def test_apply_cdc_cli_end_to_end(spark, tmp_path, capsys):
    import tools.apply_cdc as apply_cdc

    from qms_datawarehouse_spark.warehouse import ParquetWarehouse

    wh_dir = str(tmp_path / "wh")
    f1 = str(tmp_path / "feed1.parquet")
    f2 = str(tmp_path / "feed2.parquet")
    S = "_id string, _seq long, _op string, v string"
    spark.createDataFrame(
        [("a", 1, "upsert", "a1"), ("b", 1, "upsert", "b1")], S
    ).write.parquet(f1)
    spark.createDataFrame(
        [("a", 5, "delete", None), ("c", 5, "upsert", "c1")], S
    ).write.parquet(f2)

    for feed in (f1, f2):
        rc = apply_cdc.main([
            "--warehouse", wh_dir, "--table", "docs", feed,
            "--master", "local[4]",
        ])
        assert rc == 0
    out = capsys.readouterr().out
    assert "1 deletes" in out
    wh = ParquetWarehouse(spark, wh_dir)
    assert {r._id: r.v for r in wh.read("docs").collect()} == {
        "b": "b1", "c": "c1",
    }


def test_apply_cdc_cli_fresh_warehouse_edge_feeds(spark, tmp_path, capsys):
    """Empty and deletes-only first feeds against a fresh warehouse
    must report cleanly, not crash on the final row count; NDJSON
    feeds go through the sniffing reader with malformed-line skips."""
    import json

    import tools.apply_cdc as apply_cdc

    wh_dir = str(tmp_path / "wh")
    empty = str(tmp_path / "empty.parquet")
    S = "_id string, _seq long, _op string, v string"
    spark.createDataFrame([], S).write.parquet(empty)
    rc = apply_cdc.main([
        "--warehouse", wh_dir, "--table", "docs", empty,
        "--master", "local[4]",
    ])
    assert rc == 0
    assert "docs: 0 rows" in capsys.readouterr().out

    feed = str(tmp_path / "feed.ndjson")
    with open(feed, "w") as fh:
        fh.write(json.dumps(
            {"_id": "g", "_seq": 9, "_op": "delete", "v": None}) + "\n")
        fh.write("{not json\n")  # malformed line: skipped + counted
    rc = apply_cdc.main([
        "--warehouse", wh_dir, "--table", "docs", feed,
        "--master", "local[4]",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "skipped 1 malformed feed lines" in out
    assert "1 deletes" in out and "docs: 0 rows" in out


def test_curate_cli_governance_stages(spark, tmp_path, capsys):
    """Round-4 governance flags: mixture plan printed, importance
    sampling filters deterministically, k-anonymity audit warns on
    small classes."""
    import tools.curate as curate

    rc = curate.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--warehouse", str(tmp_path / "wh"),
            "--out", "curated",
            "--mix-plan", "100",
            "--quality-sample",
            "--k-anon", "lang,source",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "mix-plan src0:" in out
    assert "k-anonymity(lang, source):" in out
    # importance sampling kept a strict, deterministic subset
    import re

    m = re.search(r"curated curated: (\d+) -> (\d+) rows", out)
    assert m and 0 < int(m.group(2)) < int(m.group(1))

    # enforce mode: violations block publication with a non-zero exit
    rc2 = curate.main(
        [
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--warehouse", str(tmp_path / "wh2"),
            "--out", "gated",
            "--k-anon", "lang,source",
            "--k-anon-enforce",
        ]
    )
    out2 = capsys.readouterr().out
    assert rc2 == 2 and "refusing to publish" in out2
    import os

    assert not os.path.exists(str(tmp_path / "wh2" / "gated"))


def test_curate_cli_mix_plan_empty_input(spark, tmp_path, capsys):
    """r4-advice: an empty input table made --mix-plan divide by a
    NULL/zero summed weight (TypeError/ZeroDivisionError). It must
    skip the plan with a clear message and still exit 0."""
    import tools.curate as curate

    src = str(tmp_path / "empty.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(
        0
    ).write.parquet(src)
    rc = curate.main(
        [
            "--input", src,
            "--warehouse", str(tmp_path / "wh"),
            "--out", "curated",
            "--mix-plan", "100",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "mix-plan: no rows" in out
