"""Cross-round bench trend: read every BENCH_r*.json at the repo root
and print one line per round — common22 (the frozen cross-round
signal) and the host-load flag the r7 telemetry added. Lets a reader
separate real plan regressions from loaded-box captures without
cross-referencing SURVEY notes.

The driver wraps bench's JSON line as {"n", "rc", "cpus", "sf",
"tail": "<last 2000 chars of the line>"} — the interesting fields
(common22_value, host_load_start) sit near the END of the line, so
they survive the truncation; extract them by regex rather than
parsing the (cut-off) JSON.

Usage: python tools/bench_trend.py [repo_root]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def _field(tail: str, name: str) -> float | None:
    m = re.search(rf'"{name}": ([0-9.]+)', tail)
    return float(m.group(1)) if m else None


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    rows = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        with open(path) as f:
            d = json.load(f)
        tail = d.get("tail", "") if isinstance(d.get("tail"), str) else ""
        # raw bench line (local capture) vs driver wrapper
        c22 = d.get("common22_value") or _field(tail, "common22_value")
        load = d.get("host_load_start") or {}
        la1 = load.get("loadavg_1m")
        if la1 is None:
            m = re.search(
                r'"host_load_start": \{[^}]*"loadavg_1m": ([0-9.]+)', tail
            )
            la1 = float(m.group(1)) if m else None
        flag = (
            "n/a (pre-telemetry)"
            if la1 is None
            else ("LOADED" if la1 > 1.0 else "quiet")
        )
        rows.append((os.path.basename(path), c22, la1, flag))
    if not rows:
        print("no BENCH_r*.json found", file=sys.stderr)
        return 1
    print(f"{'round':<16}{'common22':>10}{'load1m':>8}  host")
    for name, c22, la1, flag in rows:
        c22s = f"{c22:.2f}" if isinstance(c22, (int, float)) else "-"
        las = f"{la1:.2f}" if isinstance(la1, (int, float)) else "-"
        print(f"{name:<16}{c22s:>10}{las:>8}  {flag}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
