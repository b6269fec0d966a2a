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
    curation,
    dedup,
    grouped_pandas,
    multimodal,
    rollup_hypertable,
    similarity,
    temporal,
    textops,
)
from qms_datawarehouse_spark.plans import (  # noqa: F401
    advanced,
    analytics,
    modern,
    relational,
)
from qms_datawarehouse_spark.streaming import windows  # noqa: F401
from qms_datawarehouse_spark.plans import registry
from qms_datawarehouse_spark.plans.registry import REGISTRY, oracle_sql_map, queries_map

# SURVEY §2 core + this round's determinism fixes, in driver-check
# priority order. Exactly the first 50 get a driver correctness row.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction)
    "flagship_staff_report",
    # §2.4 aggregations
    "a5_per_staff_totals",
    "a6_daily_rate_stats",
    "a7_service_duration",
    "a8_company_sets",
    "a9_rating_agg",
    "a1_high_water_mark",
    # §2.1/2.2 scan + predicates
    "s1_incremental_scan",
    # §2.5 windows
    "w2_recent_topn",
    "w3_sequential_number",
    # §2.6 dedup / set ops
    "d1_dedup_last_write",
    "d3_union_by_name",
    # §2.7 functions
    "f_scalar_suite",
    "f3_json_extract",
    "f7_iso_format",
    "user_activity_report",
    # §2.3 joins
    "j2_orders_customer",
    "j3_lineitem_orders",
    "j4_part_supplier",
    "j5_denormalized_orders",
    "s8_point_lookup",
    "p4_projection",
    "q1_pricing_summary",
    "q6_revenue_filter",
    "topk_per_group",
    # §2.8 streaming windows (batch-equivalent checks)
    "t9_tumbling_hourly",
    "t9_sliding_daily",
    "t9_sessionization",
    # LLM-pipeline operators. Swapped OUT in r3 (slots are scarce):
    # dedup_exact, dedup_embedding_cosine, a2_row_counts,
    # f_scalar_suite2, agg_rollup, semi_anti_join — all driver-green
    # in CORRECTNESS_r01 and untouched since; their slots go to the
    # round-3 curation/knn/scd2 operators, which have no driver row
    # yet. The shingle-dependent dedup queries stay (the r2 short-doc
    # guard changed their values).
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "rollup_hierarchy_1d",
    "similarity_topk_cosine",
    "similarity_ivf_probe",
    "similarity_ann_lsh",
    "multimodal_features",
    "curation_stratified_sample",
    "curation_pack_sequences",
    "curation_contamination",
    "text_pii_redact",
    "similarity_knn_join_lsh",
    "scd2_user_event_type",
    # r1 hash-fail / vacuous-pass reworks
    "w4_window_frames",
    "quantile_order_value",
    "sketch_aggregates",
    "map_functions_props",
    "q7_nation_trade",
    "q9_product_profit",
    "q22_idle_customers",
]

# Next-round allocation note: once CORRECTNESS_r02 lands green rows
# for the §2 core above, those slots should rotate to the operators
# added this round that have in-repo oracle evidence but no driver
# row yet — in priority order: funnel_view_click_purchase,
# cohort_retention_weekly, time_weighted_avg, bm25_topk,
# text_inverted_index, attribution_last_touch, robust_outliers_mad,
# basket_type_lift, growth_daily_users, revenue_share_by_nation,
# revenue_yoy_growth, then q2_min_cost_supplier, q11_important_parts,
# q20_heavy_shippers, text_repetition, curation_domain_mix,
# variant_props_agg, udtf_json_pairs, dq_constraint_checks,
# calendar_fill_gaps, asof_join_cogroup, ingest_gate_probe,
# array_functions_suite.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
