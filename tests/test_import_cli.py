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
