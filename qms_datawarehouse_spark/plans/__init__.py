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

# Round-11 rotation: CORRECTNESS_r10 came back 50/50 fully green, so
# every r10 slot is free to rotate. This window (a) takes the THREE
# never-driver-checked round-10 late additions the invariant forces
# (similarity_audio_fp_topk, dedup_cross_modal_agreement,
# join_matview_incremental_replay); (b) RETIRES THE ROUND-6 EVIDENCE
# TIER — all 23 round-6-cohort rows queued by r10 enter, after which
# nothing in the registry carries evidence older than round 7;
# (c) anchors every query over round-11-touched code — the MV
# single-pointer-swap commit (matview.py: matview_incremental_replay;
# join_matview.py: the replay row, already in via (a)) and the
# warehouse write-path clustering rework (warehouse.py:
# ingest_gate_replay_two_epochs + watermark_late_replay ride the
# partial-write path and enter via (d) anyway); (d) fills the
# remaining 22 slots with the oldest round-7-cohort rows,
# CORRECTNESS_r07 order.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- never-driver-checked (r10 late additions) ----------------
    "similarity_audio_fp_topk",
    "dedup_cross_modal_agreement",
    "join_matview_incremental_replay",  # ALSO r11-touched (semi-join)
    # ---- anchor over round-11-touched code ------------------------
    "matview_incremental_replay",  # single-pointer-swap MV commit
    # ---- the full round-10 queue: the 23 round-6-aged rows --------
    "q3_shipping_priority",
    "q4_priority_late_ship",
    "q5_region_revenue",
    "q8_market_share",
    "range_join_purchases_1h",
    "scalar_subquery",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_token_stats",
    "unpivot_status_counts",
    "w4_first_last",
    "w4_lag_lead",
    "w4_rank_family",
    "attribution_position_weighted",
    "privacy_l_diversity",
    "dedup_minhash_estimate_audit",
    "dq_content_checksum",
    "similarity_ivf_probe",
    "curation_contamination",
    "multimodal_features",
    "t9_tumbling_hourly",
    "s8_point_lookup",
    # ---- freshness: the 22 oldest round-7 rows --------------------
    "dedup_substring_spans",
    "similarity_ann_multiprobe",
    "watermark_late_replay",  # r11-touched (partial-write signature)
    "embedding_kmeans_2iter",
    "ingest_gate_replay_two_epochs",  # r11-touched (same)
    "bloom_index_point_lookup",
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
]

# Allocation note: once this window lands green, the staleness ledger
# reads: nothing older than round 7, and exactly 25 round-7 rows
# remain (queued in tests/test_driver_window.py QUEUED_NEXT_WINDOW
# for r12 — one more rotation retires the r7 tier). Next-round
# slots: (a) any red rows from CORRECTNESS_r11, (b) queries added in
# round 12, (c) the queued 25, (d) the round-8 cohort, oldest first.


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
