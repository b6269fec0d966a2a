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

# Round-7 rotation: CORRECTNESS_r06 came back 50/50 fully green (with
# it, all 175 then-registered queries were cumulatively driver-green),
# so every r6 slot is free to rotate. This window attacks the
# staleness frontier the r6 verdict named: (a) the four queries ADDED
# this round (SemDeDup pipeline, sliding-gram substring spans,
# multi-probe LSH, the T4/T5 late-data replay) — never
# driver-checked; (b) anchors over code this round touched (flagship
# always; the kmeans quantization guard, the gate-replay oracle
# parity fix, the bloom lookup None-guard, and the ingest-gate report
# rework each keep their query in-window); (c) ALL 29 queries whose
# last green row is round 2 — after this window lands, no evidence is
# older than round 3; (d) the 12 oldest round-3 rows (the dedup/
# similarity scale kernels and the heaviest TPC-H shapes first).
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- never-driver-checked: round-7 additions --------------------
    "dedup_semantic",
    "dedup_substring_spans",
    "similarity_ann_multiprobe",
    "watermark_late_replay",
    # ---- anchors over round-7-touched code --------------------------
    "embedding_kmeans_2iter",
    "ingest_gate_replay_two_epochs",
    "bloom_index_point_lookup",
    "ingest_gate_probe",
    # ---- freshness: every query last green in round 2 ---------------
    "a1_high_water_mark",
    "a5_per_staff_totals",
    "a7_service_duration",
    "a8_company_sets",
    "a9_rating_agg",
    "curation_pack_sequences",
    "curation_stratified_sample",
    "d3_union_by_name",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "f3_json_extract",
    "f7_iso_format",
    "f_scalar_suite",
    "j3_lineitem_orders",
    "j4_part_supplier",
    "j5_denormalized_orders",
    "q6_revenue_filter",
    "quantile_order_value",
    "rollup_hierarchy_1d",
    "scd2_user_event_type",
    "similarity_ann_lsh",
    "similarity_knn_join_lsh",
    "t9_sliding_daily",
    "text_pii_redact",
    "topk_per_group",
    "user_activity_report",
    "w2_recent_topn",
    "w3_sequential_number",
    "w4_window_frames",
    # ---- freshness: the 12 oldest round-3 rows ----------------------
    "bm25_topk",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "f_scalar_suite2",
    "q2_min_cost_supplier",
    "q7_nation_trade",
    "q9_product_profit",
    "q11_important_parts",
    "q20_heavy_shippers",
    "q22_idle_customers",
    "similarity_topk_cosine",
    "sketch_kmv_distinct",
]

# Allocation note: once this window lands green, zero rows remain
# with round-2-aged evidence (the r6 verdict's staleness frontier);
# the remaining 35 round-3 rows are the r8 freshness pool. Next-round
# slots: (a) any red rows from CORRECTNESS_r07, (b) queries added in
# round 8 (tracked in tests/test_driver_window.py QUEUED_NEXT_WINDOW
# as they land), (c) the round-3 cohort, oldest first.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
