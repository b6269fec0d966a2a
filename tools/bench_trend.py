"""Cross-round bench trend: read every BENCH_r*.json at the repo root
and print one line per round — common22 (the frozen cross-round
signal), the host-load flag the r7 telemetry added, and (r11+) the
box-speed calibration anchor with an anchor-NORMALIZED common22.

Why normalize: the host swings ~1.4× session-to-session with loadavg
and steal both clean (same-code A/B, r11 notes) — absolute wall-times
track the box, not just the code. The bench runs two fixed workloads
per capture (4M-row sha2 compute, 1024-key shuffle) and reports them
as ``calibration``; dividing common22 by the compute anchor's ratio
to the fastest observed anchor puts every round on the same
box-speed scale, so a cross-round move that survives normalization
is a code move, not a host move.

The driver wraps bench's JSON line as {"n", "rc", "cpus", "sf",
"tail": "<last 2000 chars of the line>"} — the interesting fields
(common22_value, host_load_start, calibration) sit near the END of
the line, so they survive the truncation; extract them by regex
rather than parsing the (cut-off) JSON.

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
        cal = d.get("calibration") or {}
        comp = cal.get("compute_sec")
        if comp is None:
            m = re.search(
                r'"calibration": \{[^}]*"compute_sec": ([0-9.]+)', tail
            )
            comp = float(m.group(1)) if m else None
        flag = (
            "n/a (pre-telemetry)"
            if la1 is None
            else ("LOADED" if la1 > 1.0 else "quiet")
        )
        rows.append((os.path.basename(path), c22, la1, comp, flag))
    if not rows:
        print("no BENCH_r*.json found", file=sys.stderr)
        return 1

    # reference = the fastest box state any anchored capture saw; a
    # round's normalized common22 = c22 × (ref / its own anchor)
    anchors = [c for (_, _, _, c, _) in rows if isinstance(c, (int, float))]
    ref = min(anchors) if anchors else None

    print(
        f"{'round':<16}{'common22':>10}{'anchor':>8}{'norm_c22':>10}"
        f"{'load1m':>8}  host"
    )
    for name, c22, la1, comp, flag in rows:
        c22s = f"{c22:.2f}" if isinstance(c22, (int, float)) else "-"
        las = f"{la1:.2f}" if isinstance(la1, (int, float)) else "-"
        comps = f"{comp:.3f}" if isinstance(comp, (int, float)) else "-"
        if (
            isinstance(c22, (int, float))
            and isinstance(comp, (int, float))
            and ref
        ):
            norm = f"{c22 * (ref / comp):.2f}"
        else:
            norm = "-"
        print(f"{name:<16}{c22s:>10}{comps:>8}{norm:>10}{las:>8}  {flag}")
    if ref is not None:
        print(
            f"\nnorm_c22 = common22 × ({ref:.3f} / round's compute anchor);"
            " anchored rounds only (r11+). Rounds without an anchor"
            " print '-' — compare their raw common22 against the idle"
            " history in the bench notes instead."
        )
        print(
            "Caveat: the anchor corrects CPU-speed swings only; page-"
            "cache state and residual 5m load (see the settle block in"
            " each capture) still move common22 independently — treat"
            " norm_c22 as a first-order correction, and A/B the prior"
            " commit when a move survives it."
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
