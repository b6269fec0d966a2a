"""Pre-driver gate in one command: run the EXACT driver correctness
window (the first 50 registered queries) through the driver-faithful
DuckDB oracle harness at one or more scale factors.

Usage:
    python tools/window_check.py [sf_dir ...]
    # default: /root/testdata/sf0.01 then /root/testdata/sf0.1

Exit code 0 only if every window query fully matches (rows + schema +
value hash) at every requested scale factor — the same comparison the
driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import subprocess
import sys

sys.path.insert(0, ".")

DEFAULT_SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def check_survey_counts() -> None:
    """Fail loudly if SURVEY §8's registered-query count drifted from
    the live registry (the bookkeeping slip rounds 4-5 shipped twice):
    the FIRST 'N registered queries, M with DuckDB oracles' line in
    SURVEY.md — the current-round status — must equal reality."""
    import re

    from qms_datawarehouse_spark.plans.registry import REGISTRY

    with open("SURVEY.md") as fh:
        m = re.search(
            r"(\d+) registered queries?,? (\d+) with DuckDB oracles",
            fh.read(),
        )
    if not m:
        raise SystemExit("SURVEY.md: no 'N registered queries' status line")
    doc_total, doc_oracle = int(m.group(1)), int(m.group(2))
    total = len(REGISTRY)
    with_oracle = sum(1 for q in REGISTRY.values() if q.sql is not None)
    if (doc_total, doc_oracle) != (total, with_oracle):
        raise SystemExit(
            f"SURVEY.md says {doc_total} registered / {doc_oracle} with "
            f"oracles; live registry has {total} / {with_oracle} — update "
            "the §8 status line"
        )
    print(f"survey counts OK: {total} registered, {with_oracle} with oracles")


def main(argv: list[str] | None = None) -> int:
    sf_dirs = (argv if argv is not None else sys.argv[1:]) or DEFAULT_SFS
    from qms_datawarehouse_spark.plans import queries_map

    check_survey_counts()
    window = list(queries_map())[:50]
    rc = 0
    for sf in sf_dirs:
        print(f"== window check @ {sf} ==", flush=True)
        res = subprocess.run(
            [sys.executable, "tests/oracle_harness.py", sf, *window]
        )
        rc |= res.returncode
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
