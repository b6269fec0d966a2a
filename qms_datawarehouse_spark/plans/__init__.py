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
    grouped_pandas,
    multimodal,
    pq,
    profile,
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

# Round-3 rotation: CORRECTNESS_r02 greened the §2 core, so those
# slots rotate to the 40 registered queries that have NEVER had a
# driver row (cumulative driver-checked coverage 84/124 -> 124/124
# attempted), plus: the four HUGEINT-fixed oracles (driver-red in
# r02, re-checked for green), multimodal_pipeline (rows-only in r01,
# now value-checked), the flagship anchor, and four anchors over the
# merge/dedup code paths rewritten this round (ADVICE CAS/lock/index
# fixes). sketch_aggregates (rows-only by design) yields its slot to
# the value-checked sketch_kmv_distinct per VERDICT r02 item 2.
# Exactly the first 50 get a driver correctness row.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # r02 hash-fails, oracle HUGEINT casts fixed this round
    "q7_nation_trade",
    "q9_product_profit",
    "q22_idle_customers",
    "map_functions_props",
    # rows-only in r01, oracle added since — first value-checked row
    "multimodal_pipeline",
    # rows-only slot traded for the value-checked KMV sketch
    "sketch_kmv_distinct",
    # anchors over the merge/dedup code rewritten this round
    "d1_dedup_last_write",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    "t9_sessionization",
    # ---- never-driver-checked queries (cumulative coverage push) ----
    # funnel/retention/growth analytics
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "growth_daily_users",
    "attribution_last_touch",
    "basket_type_lift",
    "revenue_share_by_nation",
    "revenue_yoy_growth",
    "robust_outliers_mad",
    "time_weighted_avg",
    # text / retrieval
    "text_repetition",
    "text_inverted_index",
    "bm25_topk",
    # TPC-H-shape additions
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q20_heavy_shippers",
    # curation / dedup / similarity never checked at the driver
    "curation_domain_mix",
    "curation_split_summary",
    "corpus_curation",
    "dedup_embedding_lsh",
    "ingest_gate_probe",
    # grouped/arrow python surfaces
    "grouped_arrow_zscore",
    "multimodal_features_arrow",
    "asof_join_cogroup",
    "udtf_json_pairs",
    # function suites + semantics probes
    "array_functions_suite",
    "regexp_functions_suite",
    "datetime_functions_suite",
    "string_functions_suite",
    "null_semantics_suite",
    "decimal_arithmetic_suite",
    "variant_props_agg",
    "dq_constraint_checks",
    "calendar_fill_gaps",
    "w4_range_interval",
    "heavy_hitters_exact",
    # §2 rows green in r01 under other names but never re-rowed
    "a2_row_counts",
    "f_scalar_suite2",
    "agg_rollup",
    "semi_anti_join",
]

# Next-round allocation note: after this window lands, the only
# registered queries with NO driver row ever are the round-3
# additions — entity_match_blocked, event_transitions,
# dedup_passages, text_tfidf_topk, text_top_bigrams,
# similarity_pq_adc, histogram_order_value, rfm_segments,
# stats_sufficient_moments, similarity_ivfpq,
# curation_shuffle_shards, curation_repeat_upsample,
# dedup_canonical, and the late-round-3 seven: dedup_split_leakage,
# curation_split_by_cluster, text_normalize, profile_orders,
# scd2_asof_lookup, curation_sample_exact_k, cdc_resolution_probe
# (all twenty in-repo oracle-green). Round-4 slots: (a) any red rows
# from CORRECTNESS_r03, (b) those twenty, (c) §2 core re-confirmation
# on a sampled basis.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
