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
from qms_datawarehouse_spark.sources import bloomindex  # noqa: F401
from qms_datawarehouse_spark.streaming import windows  # noqa: F401
from qms_datawarehouse_spark.plans import registry
from qms_datawarehouse_spark.plans.registry import REGISTRY, oracle_sql_map, queries_map

# Round-6 rotation: CORRECTNESS_r05 came back 50/50 fully green, so
# every r5 slot is free to rotate. This window = (a) the five
# never-driver-checked queries — the three queued since round 4
# (embedding_label_coherence, seasonality_dow_index,
# funnel_time_to_convert) plus the two added THIS round
# (bloom_index_point_lookup over the r5-reworked CAS/bit-OR index
# refresh, ingest_gate_replay_two_epochs over the streaming admission
# math) — closing them, plus (b), reaches 175/175 cumulative
# driver-checked: every registered query with a fully-green row in
# some round;
# (b) the three late-round additions (U-shaped attribution,
# l-diversity, minhash estimator audit, fixed-point k-means,
# content checksum);
# (c) anchors over code touched this round (flagship always;
# ingest_gate_probe rides the max_rejects rework of ingest_dedup);
# (d) 38 freshness slots given to the OLDEST evidence — all 33
# queries whose last green row is round 1, plus five round-2
# rows spanning the dedup/similarity/curation/multimodal/
# streaming families. Exactly the first 50 get a driver row.
_DRIVER_WINDOW = [
    # flagship (reference staff_reports.json reproduction) — anchor
    "flagship_staff_report",
    # ---- never-driver-checked: queued r4 additions ------------------
    "embedding_label_coherence",
    "seasonality_dow_index",
    "funnel_time_to_convert",
    # ---- never-driver-checked: round-6 additions --------------------
    "bloom_index_point_lookup",
    "ingest_gate_replay_two_epochs",
    # ---- anchor over the ingest-gate max_rejects rework -------------
    "ingest_gate_probe",
    # ---- freshness: every query last green in round 1 ---------------
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
    # ---- never-driver-checked: late round-6 additions ----------------
    "attribution_position_weighted",
    "privacy_l_diversity",
    "dedup_minhash_estimate_audit",
    "embedding_kmeans_2iter",
    "dq_content_checksum",
    # ---- freshness: five round-2 rows across operator families ------
    "similarity_ivf_probe",
    "curation_contamination",
    "multimodal_features",
    "t9_tumbling_hourly",
    "s8_point_lookup",
]

# Allocation note: once this window lands green, all 175 registered
# queries have a fully-green driver row in some round (the rows-only
# sketch_aggregates slot was retired in round 6 — the deterministic
# KMV/CMS/bottom-k family carries the sketch evidence with full value
# checks). Next-round slots: (a) any red rows from CORRECTNESS_r06,
# (b) queries added next round (tracked in tests/test_driver_window.py
# QUEUED_NEXT_WINDOW as they land), (c) freshness re-confirmation of
# the oldest remaining evidence (the round-2 cohort).


# Applied lazily by queries_map()/oracle_sql_map(): eager reordering
# here would race the package's circular imports (an operators module
# imported directly triggers this __init__ before its own decorators
# finish registering).
registry.DRIVER_WINDOW[:] = _DRIVER_WINDOW

__all__ = ["REGISTRY", "queries_map", "oracle_sql_map"]
