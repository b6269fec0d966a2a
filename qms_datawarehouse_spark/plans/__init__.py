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
    join_matview,
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

# Round-12 rotation: CORRECTNESS_r11 came back 50/50 fully green, so
# every r11 slot is free to rotate. This window (a) takes the TWO
# never-driver-checked rows the invariant forces —
# matview_bucketed_replay (the r11 late addition, the registry's only
# never-checked query entering the round) and matview_null_sum_replay
# (added this round for the NULL-correct (sum, non-null count) merge
# algebra); (b) RETIRES THE ROUND-7 EVIDENCE TIER — all 25
# round-7-cohort rows queued by r11 enter, after which nothing in the
# registry carries evidence older than round 8; (c) anchors the
# flagship plus every replay row over round-12-touched code — the MV
# lineage-durability + CAS + NULL-sum rework (matview.py,
# join_matview.py, warehouse.py: matview_incremental_replay,
# join_matview_incremental_replay, and the two rows in (a));
# (d) adds the three NULL-semantics-audit rows (scd2_null_states,
# asof_null_ts, rollup_incremental_replay — never-checked, added
# this round to driver-pin the audit's fixes); (e) fills the
# remaining 17 slots with the oldest round-8-cohort rows,
# CORRECTNESS_r08 order.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- never-driver-checked ------------------------------------
    "matview_bucketed_replay",  # ALSO r12-touched (matview.py)
    "matview_null_sum_replay",  # new this round (NULL-sum algebra)
    # the round-12 NULL-semantics audit's driver rows: each fix in
    # scd2_from_stream / asof_join / rollup merge_partials gets a
    # registry row that MANUFACTURES the NULLs the fixtures lack
    "scd2_null_states",
    "asof_null_ts",
    "rollup_incremental_replay",
    # ---- anchors over round-12-touched code -----------------------
    "matview_incremental_replay",  # CASed lineage advance, nn merge
    "join_matview_incremental_replay",  # CASed advance + None guard
    # ---- the full round-11 queue: the 25 round-7-aged rows --------
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
    # ---- freshness: the 17 oldest round-8 rows --------------------
    "dedup_semantic",
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
    "zorder_routed_scan",
]

# Allocation note: once this window lands green, the staleness ledger
# reads: nothing older than round 8, and exactly 28 round-8 rows
# remain (queued in tests/test_driver_window.py QUEUED_NEXT_WINDOW
# for r13 — one more rotation retires the r8 tier). Next-round
# slots: (a) any red rows from CORRECTNESS_r12, (b) queries added in
# round 13, (c) the queued 28, (d) the round-9 cohort, oldest first.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
