"""Pin the driver-correctness window.

The driver verifies the FIRST 50 entries of ``queries()``. Rotation
policy (round 3+): a query may leave the window only if a past
CORRECTNESS_r*.json shows it fully green (rows+schema+hash) AND its
code/oracle is unchanged since; freed slots go to queries with no
driver row yet. These tests pin that invariant — every window entry
is either never-driver-checked, previously red (being re-checked), or
an explicitly-listed anchor over code changed this round.
"""

from __future__ import annotations

import json
import os

from qms_datawarehouse_spark.plans import _DRIVER_WINDOW, REGISTRY, queries_map

# r12 anchors: flagship + every query whose code materially changed
# this round — the MV lineage-durability + CAS + NULL-correct-sum
# rework (matview.py, join_matview.py, warehouse.py's
# update_version_meta / _stage_version_partial / compact): all four
# MV replay rows ride those paths live.
ANCHORS = [
    "flagship_staff_report",
    "matview_incremental_replay",
    "matview_bucketed_replay",
    "matview_null_sum_replay",
    "join_matview_incremental_replay",
    # NULL-semantics audit (r12): rows over the touched operators —
    # scd2_from_stream, asof_join, rollup merge_partials — plus the
    # manufactured-NULL rows that pin each fix driver-verifiably
    "scd2_user_event_type",
    "rollup_hierarchy_1d",
    "scd2_null_states",
    "asof_null_ts",
    "rollup_incremental_replay",
]


def _ever_green():
    green = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for fname in sorted(os.listdir(root)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            with open(os.path.join(root, fname)) as fh:
                for name, row in json.load(fh).items():
                    if (
                        row.get("rows_match")
                        and row.get("schema_match")
                        and row.get("hash_match")
                    ):
                        green.add(name)
    return green


def test_window_is_exactly_first_50():
    assert len(_DRIVER_WINDOW) == 50
    assert list(queries_map())[:50] == _DRIVER_WINDOW


def test_anchors_inside_window():
    first50 = set(list(queries_map())[:50])
    missing = [n for n in ANCHORS if n not in first50]
    assert not missing, f"anchor queries outside driver window: {missing}"


# queries ADDED this round (no driver row possible yet): either
# already swapped into the window, or queued here for the next window
# so nothing falls through. The r12 rotation emptied the entire r11
# staging queue (all 26 entries — the never-checked
# matview_bucketed_replay plus the 25 round-7-cohort rows — are
# in-window, alongside the round-12 addition matview_null_sum_replay),
# which retires the round-7 evidence tier when green. r13 pool: the
# 25 round-8-cohort rows the 50-slot r12 window couldn't fit
# (CORRECTNESS_r08 order) — all ever-green (r8), so the invariant
# doesn't force them; the queue is the bookkeeping that they MUST
# enter the r13 window, which retires the round-8 evidence tier —
# plus the three r8 rows the NULL-audit additions displaced from the
# r12 window's fill (also ever-green r8).
QUEUED_NEXT_WINDOW: list[str] = [
    "dq_distribution_drift",
    "similarity_rrf_fusion",
    "similarity_mmr_rerank",
    "stats_bootstrap_poisson",
    "privacy_dp_laplace_counts",
    "experiment_cuped_adjusted",
    "curation_coreset_kcenter",
    "dq_freshness_sla",
    "array_functions_suite",
    "regexp_functions_suite",
    "datetime_functions_suite",
    "string_functions_suite",
    "map_functions_props",
    "null_semantics_suite",
    "decimal_arithmetic_suite",
    "multimodal_pipeline",
    "multimodal_features_arrow",
    "variant_props_agg",
    "udtf_json_pairs",
    "t9_sessionization",
    "a2_row_counts",
    "w4_range_interval",
    "asof_join_cogroup",
    "grouped_arrow_zscore",
    "time_weighted_avg",
    "heavy_hitters_exact",
    "dq_constraint_checks",
    "curation_split_summary",
]


def test_rotated_out_queries_were_driver_green():
    # nothing may leave the window without a fully-green driver row;
    # brand-new queries must be explicitly queued for the next window
    green = _ever_green()
    out = set(queries_map()) - set(_DRIVER_WINDOW)
    never_checked_out = [
        n for n in sorted(out)
        if n not in green
        and n not in QUEUED_NEXT_WINDOW
    ]
    assert not never_checked_out, (
        f"queries outside window with no green driver row: {never_checked_out}"
    )


def test_ordering_is_a_permutation():
    # reordering must not drop or invent queries
    assert sorted(queries_map()) == sorted(REGISTRY)
    assert all(REGISTRY[n].name == n for n in REGISTRY)


def test_direct_operator_import_still_registers_everything():
    # the circular-import path: importing an operators module directly
    # triggers plans/__init__ mid-registration; the lazy ordering must
    # still see the module's queries afterwards
    import qms_datawarehouse_spark.operators.multimodal  # noqa: F401

    assert "multimodal_features" in queries_map()


def test_survey_count_matches_live_registry():
    # the bookkeeping slip that shipped two rounds running: SURVEY §8's
    # count must equal the live registry (same check gates window_check)
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.window_check import check_survey_counts

    cwd = os.getcwd()
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        check_survey_counts()
    finally:
        os.chdir(cwd)


def test_similarity_import_before_plans_package():
    """Regression (round 7): semantic_gate's module-level k-means
    imports must come from the kmeans_core LEAF, not similarity —
    importing similarity before the plans package finished
    initializing died with 'partially initialized module' in the
    circular-import window (a fresh interpreter is required; this
    process already has the package loaded)."""
    import subprocess
    import sys

    code = (
        "from qms_datawarehouse_spark.operators.incremental_dedup "
        "import ingest_dedup\n"
        "import qms_datawarehouse_spark.operators.similarity\n"
        "from qms_datawarehouse_spark.plans import queries_map\n"
        "assert 'semantic_gate_replay_two_epochs' in queries_map()\n"
    )
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-c", code], check=True, env=env, cwd="/tmp"
    )


def test_duplicate_registration_raises():
    """Regression (round 7): registering a second query under an
    existing name must raise, not silently replace the original —
    two TPC-H drafts shadowed advanced.py's registered shapes and the
    count gate caught it only by arithmetic."""
    import pytest

    from qms_datawarehouse_spark.plans.registry import query

    with pytest.raises(RuntimeError, match="already registered"):
        query("flagship_staff_report", None)(lambda spark, sf: None)
