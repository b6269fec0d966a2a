"""Per-query timing probe for optimization A/Bs.

Times the named queries with the bench protocol (1 cold + warm
min-of-N) on the same session config bench.py uses, printing one JSON
line per query. Unlike bench.py this takes an explicit query list, so
interleaved A/B legs of a few rows are cheap.

Usage:
    python tools/qtime.py q1 q2 ...           # default 3 warm runs
    python tools/qtime.py --runs 5 q1 q2
    python tools/qtime.py --jobs q1           # also dump per-job wall
                                              # times via a status
                                              # listener (profiling)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--jobs", action="store_true",
                    help="print per-job wall times of the last warm run")
    args = ap.parse_args()

    from qms_datawarehouse_spark.plans import queries_map
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark(
        "qms-qtime", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    registry = queries_map()
    registry["q6_revenue_filter"](spark, SF_DIR).count()  # session warm-up

    for name in args.names:
        fn = registry[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        cold = time.monotonic() - t0
        warm = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            warm.append(round(time.monotonic() - t0, 3))
        rec = {
            "query": name,
            "cold": round(cold, 3),
            "warm_min": min(warm),
            "warm": warm,
        }
        if args.jobs:
            sc = spark.sparkContext
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup() or [])
            t0 = time.monotonic()
            fn(spark, SF_DIR).count()
            rec["profiled_run_sec"] = round(time.monotonic() - t0, 3)
            jobs = []
            for jid in sorted(set(tracker.getJobIdsForGroup() or []) - before):
                info = tracker.getJobInfo(jid)
                if info is None:
                    continue
                jobs.append({"job": jid, "stages": len(info.stageIds)})
            rec["n_jobs"] = len(jobs)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
