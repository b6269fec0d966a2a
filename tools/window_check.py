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


def main(argv: list[str] | None = None) -> int:
    sf_dirs = (argv if argv is not None else sys.argv[1:]) or DEFAULT_SFS
    from qms_datawarehouse_spark.plans import queries_map

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
