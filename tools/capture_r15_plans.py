"""Dump plan evidence for the round-15 before/after files.

For each named query: run it once at $SPARK_GRAFT_SF_DIR (default
sf0.01 — plan shape, not timing), then write the pre-checkpoint
executed plan (planaudit capture when the query checkpoints; the
returned frame's executedPlan otherwise) plus every planaudit side
capture the run recorded (join_matview:dim_diff / dim_probe,
zorder_write) to <outdir>/<query>_<tag>.txt.

Usage:
    python tools/capture_r15_plans.py <tag> <outdir> <query> [...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

SIDE_CAPTURES = [
    "join_matview:dim_diff",
    "join_matview:dim_probe",
    "zorder_write",
]


def main() -> None:
    tag, outdir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from qms_datawarehouse_spark.planaudit import PRE_CHECKPOINT_PLANS
    from qms_datawarehouse_spark.plans import queries_map
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark("qms-plan-capture", master="local[8]",
                      shuffle_partitions=8)
    registry = queries_map()
    for name in names:
        PRE_CHECKPOINT_PLANS.clear()
        df = registry[name](spark, SF_DIR)
        df.count()
        sections = []
        main_plan = PRE_CHECKPOINT_PLANS.get(name)
        if main_plan is None:
            main_plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append(f"== {name}: result plan ==\n{main_plan}")
        for key in SIDE_CAPTURES:
            if key in PRE_CHECKPOINT_PLANS:
                sections.append(
                    f"== side capture: {key} ==\n{PRE_CHECKPOINT_PLANS[key]}"
                )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write("\n\n".join(sections))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
