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

# Round-10 rotation: CORRECTNESS_r09 came back 50/50 fully green, so
# every r9 slot is free to rotate. This window (a) RETIRES THE
# ROUND-5 EVIDENCE TIER — all 22 rows queued by r9 enter (the two
# never-checked round-9 late additions rfm_segments_approx /
# similarity_image_phash_topk plus the 20 r5-aged rows), after which
# nothing in the registry carries evidence older than round 6;
# (b) takes the two round-10 additions — dedup_audio_fingerprint and
# phash_gate_replay_two_epochs (both never-checked); (c) anchors
# every query over round-10-touched code — the gate-family hardening
# (incremental_dedup/semantic_gate: ingest_gate_probe +
# semantic_gate_replay_two_epochs) and the phash evidence guards
# (multimodal.py: dedup_image_phash; the top-k twin is already in
# via the queue); (d) fills the remaining 22 slots with the oldest
# round-6-cohort rows, CORRECTNESS_r06 order (q3_shipping_priority,
# the 23rd-oldest, yields its slot to the replay row and heads the
# r11 queue).
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- never-driver-checked -----------------------------------
    "dedup_audio_fingerprint",
    "phash_gate_replay_two_epochs",
    "rfm_segments_approx",
    "similarity_image_phash_topk",  # ALSO r10-touched (min-cand guard)
    # ---- anchors over round-10-touched code -----------------------
    "dedup_image_phash",
    "ingest_gate_probe",
    "semantic_gate_replay_two_epochs",
    # ---- the full round-9 queue: the last 20 round-5-aged rows ----
    "w4_dist_functions",
    "agg_mode_exact",
    "events_gap_islands",
    "sketch_cms_heavy_hitters",
    "sketch_bottomk_quantiles",
    "a6_daily_rate_stats",
    "s1_incremental_scan",
    "d1_dedup_last_write",
    "histogram_order_value",
    "rfm_segments",
    "stats_sufficient_moments",
    "timeseries_ohlc_daily",
    "experiment_ab_ttest",
    "rolling_7d_active_users",
    "json_schema_profile",
    "j2_orders_customer",
    "p4_projection",
    "q1_pricing_summary",
    "dq_referential_integrity",
    "session_path_analysis",
    # ---- freshness: the 23 oldest round-6 rows --------------------
    "embedding_label_coherence",
    "seasonality_dow_index",
    "funnel_time_to_convert",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "asof_join_last_purchase",
    "d3_set_ops",
    "dedup_embedding_cosine",
    "dedup_exact",
    "grouped_pandas_zscore",
    "pivot_status_by_year",
    "q10_returned_revenue",
    "q12_priority_lines",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q21_sole_late_supplier",
]

# Allocation note: once this window lands green, the staleness ledger
# reads: nothing older than round 6, and exactly 23 round-6 rows
# remain (queued in tests/test_driver_window.py QUEUED_NEXT_WINDOW
# for r11 — one more rotation retires the r6 tier). Next-round
# slots: (a) any red rows from CORRECTNESS_r10, (b) queries added in
# round 11, (c) the queued 23, (d) the round-7 cohort, oldest first.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
