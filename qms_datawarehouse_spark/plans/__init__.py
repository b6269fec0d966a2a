"""Query library. Importing this package registers every query into
``qms_datawarehouse_spark.plans.registry.REGISTRY`` (name → Spark
callable + DuckDB oracle SQL), which ``__spark_entry__`` exposes to
the driver.

The driver verifies the FIRST 50 registered queries (registration
order) against their DuckDB oracles. ``_DRIVER_WINDOW`` below pins
that window explicitly to the SURVEY §2 core surface — the flagship
staff report, A/J/S/W/D/F rows, streaming windows, the dedup/
similarity operator suite, and every query whose determinism was
reworked this round — instead of leaving the order to import
side-effect accidents. Queries outside the window remain registered
and oracle-checked by the in-repo suite (tests/test_queries_oracle.py
parametrizes all of them)."""

from qms_datawarehouse_spark.operators import (  # noqa: F401
    cdc,
    curation,
    dedup,
    graph,
    grouped_pandas,
    matview,
    multimodal,
    pq,
    profile,
    rollup_hypertable,
    semantic_gate,
    similarity,
    temporal,
    textops,
    zorder,
)
from qms_datawarehouse_spark.plans import (  # noqa: F401
    advanced,
    analytics,
    modern,
    relational,
)
from qms_datawarehouse_spark.sources import bloomindex, bucketed, fileskip  # noqa: F401
from qms_datawarehouse_spark.streaming import windows  # noqa: F401
from qms_datawarehouse_spark.plans import registry
from qms_datawarehouse_spark.plans.registry import REGISTRY, oracle_sql_map, queries_map

# Round-8 rotation: CORRECTNESS_r07 came back 50/50 fully green, so
# every r7 slot is free to rotate. This window retires the evidence
# debt the r7 verdict quantified: (a) ALL 26 queries queued in
# QUEUED_NEXT_WINDOW across round 7 (the window froze at 50 before
# the third/fourth waves landed) plus the two round-8 additions
# (dedup_semantic_scaled — the K∝N knob executed — and
# text_bpe_encode); (b) anchors over round-8-touched code (flagship
# always; dedup_semantic's pipeline body was extracted into the
# helper the scaled row shares, so it re-proves the refactor);
# (c) the 20 oldest round-3 rows, oldest families first (the
# function suites, multimodal, variant/UDTF, sessionization) — the
# 15 r3 rows that don't fit are explicitly queued for r9, which
# finishes the tier.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- anchor over round-8-touched code ---------------------------
    "dedup_semantic",
    # ---- never-driver-checked: round-8 additions --------------------
    "dedup_semantic_scaled",
    "text_bpe_encode",
    # ---- never-driver-checked: the full round-7 queue ---------------
    "semantic_gate_replay_two_epochs",
    "quality_model_score",
    "curation_dsir_weights",
    "join_salted_skew",
    "interval_containment_join",
    "graph_pagerank_2iter",
    "text_chunking",
    "fileskip_routed_scan",
    "q10_returned_items",
    "q14_promo_effect",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "text_tokenize_ids",
    "dedup_ppjoin_exact",
    "stats_ks_drift",
    "bucketed_join_scan",
    "matview_incremental_replay",
    "zorder_routed_scan",
    "dq_distribution_drift",
    "similarity_rrf_fusion",
    "similarity_mmr_rerank",
    "stats_bootstrap_poisson",
    "privacy_dp_laplace_counts",
    "experiment_cuped_adjusted",
    "curation_coreset_kcenter",
    "dq_freshness_sla",
    # ---- freshness: the 20 oldest round-3 rows ----------------------
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

# Allocation note: once this window lands green, the never-checked
# backlog is ZERO (every registered query has a driver row) and only
# 15 rows carry round-3-aged evidence — all 15 are explicitly queued
# in tests/test_driver_window.py QUEUED_NEXT_WINDOW so the r9
# rotation retires the tier completely. Next-round slots: (a) any red
# rows from CORRECTNESS_r08, (b) queries added in round 9, (c) the
# queued 15, (d) the round-5 cohort, oldest first.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
