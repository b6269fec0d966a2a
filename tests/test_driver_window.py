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

# r13 anchors: flagship + every query whose code materially changed
# this round — the refresh-TOCTOU pin-first rework (matview.py,
# join_matview.py: mv_version pinned BEFORE the lineage read, _full()
# CASed) rides all four MV replay rows live; the scd2_from_stream
# NULL-ts drop (temporal.py) rides both existing scd2 rows.
ANCHORS = [
    "flagship_staff_report",
    "matview_incremental_replay",
    "matview_bucketed_replay",
    "matview_null_sum_replay",
    "join_matview_incremental_replay",
    "scd2_user_event_type",
    "scd2_null_states",
    "scd2_null_ts",
    # ANSI degenerate-input audit (r13): the manufactured-edge rows
    # plus a representative per try_divide-swept shared kernel, the
    # re-stated zscore oracle, and the engine cursor-coercion reorder
    "similarity_zero_norm",
    "experiment_ttest_empty_arm",
    "similarity_topk_cosine",
    "experiment_ab_ttest",
    "grouped_pandas_zscore",
    "s1_incremental_scan",
    # the ANN-maintenance addition (new this round, never-checked)
    "ivf_index_incremental_replay",
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
# so nothing falls through. The r13 rotation emptied the entire r12
# staging queue (all 28 round-8-cohort rows are in-window), which
# retires the round-8 evidence tier when green; the three round-13
# additions (scd2_null_ts, similarity_zero_norm,
# experiment_ttest_empty_arm, ivf_index_incremental_replay) are
# in-window too. r14 pool: the 40 round-9-cohort rows the 50-slot r13
# window couldn't fit (CORRECTNESS_r09 order, including the 7 the
# audit anchors and the ANN-maintenance addition displaced) — all
# ever-green (r9), so the invariant doesn't force
# them; the queue is the bookkeeping that they MUST enter the r14
# window, which retires the round-9 evidence tier.
QUEUED_NEXT_WINDOW: list[str] = [
    # the 7 round-9 rows the r13 audit anchors and the ANN-maintenance
    # addition displaced from the window fill (r09 order preserved)
    "text_inverted_index",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "growth_daily_users",
    "robust_outliers_mad",
    "attribution_last_touch",
    "basket_type_lift",
    "revenue_share_by_nation",
    "revenue_yoy_growth",
    "calendar_fill_gaps",
    "agg_rollup",
    "semi_anti_join",
    "cdc_resolution_probe",
    "cdc_replay_two_epochs",
    "curation_sample_exact_k",
    "entity_match_blocked",
    "curation_shuffle_shards",
    "curation_repeat_upsample",
    "curation_temperature_mix",
    "curation_temporal_split",
    "privacy_k_anonymity",
    "curation_quality_weighted_sample",
    "dedup_clusters",
    "dedup_passages",
    "dedup_canonical",
    "dedup_split_leakage",
    "curation_split_by_cluster",
    "dedup_cross_source_matrix",
    "dedup_minhash_recall_audit",
    "dedup_containment",
    "similarity_pq_adc",
    "similarity_ivfpq",
    "profile_orders",
    "similarity_truncated_rerank",
    "scd2_asof_lookup",
    "event_transitions",
    "text_tfidf_topk",
    "text_top_bigrams",
    "text_normalize",
    "text_bigram_lm_score",
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
