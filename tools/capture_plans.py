"""Regenerate docs/PLANS.md: captured `explain("formatted")` output for
representative queries — the evidence behind README/SCALING scale
claims. Run from the repo root."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

PICKS = {
    "s8_point_lookup": "Both equality predicates reach the scan (PushedFilters); ReadSchema is 4 columns of 6.",
    "s1_incremental_scan": "The delta predicate pushes as GreaterThan on the raw cursor column — row-group skipping at 100 TB.",
    "j2_orders_customer": "Dim side broadcast (BroadcastHashJoin); the fact is never shuffled for the join — only the 5-group aggregate moves.",
    "flagship_staff_report": "One lineitem scan feeds the whole report; dims enter via BroadcastHashJoin; two-level HashAggregate tree (order grain -> day grain -> staff grain).",
    "asof_join_last_purchase": "No range explosion: tagged union + one Window pass per key.",
    "dedup_minhash_lsh": "Signatures compute per-row (no explode before the band layout); candidate + verify stages are hash equi-joins.",
    "q7_nation_trade": "Bilateral-pair nation filter pushed into BOTH nation-role scans; all dims broadcast; single lineitem pass.",
    "dedup_embedding_lsh": "Near-dup candidates via hyperplane-bucket equi-join (cost ~ sum of bucket^2) — contrast with the intentional all-pairs baseline.",
    "curation_contamination": "Benchmark shingle set broadcast into the probe join; one shingling pass, one groupBy — never corpus x corpus.",
    "similarity_knn_join_lsh": "Per-vector top-k rides WindowGroupLimit (partial top-k BEFORE the exchange): at most k rows per query vector cross the shuffle.",
    "curation_stratified_sample": "Sampling is a map-side hash-threshold filter co-planned with the scan — no shuffle, no RNG state.",
    "q2_min_cost_supplier": "Correlated per-part min de-correlates into a window over the region-filtered supply list; every dim broadcasts; ordered LIMIT is a TakeOrderedAndProject.",
    "heavy_hitters_exact": "Frequency counts partial-aggregate before the exchange; the per-group top-3 rides WindowGroupLimit, so at most k rows per group survive the sort.",
    "w4_range_interval": "Time-based RANGE frame over epoch seconds: one keyed exchange + in-partition sort; the running aggregates never leave the window operator.",
    "text_repetition": "Three gram branches union before a two-level aggregation tree; partial aggregation collapses per-task gram counts before either exchange.",
    "dq_constraint_checks": "Each constraint is an independent aggregate branch; the orphan-FK check is a broadcast left-anti join on the fact.",
    "funnel_view_click_purchase": "Each funnel stage is filter -> groupBy(user_id) min -> same-key equi-join: every exchange hashes user_id, state is one row per qualifying user.",
    "time_weighted_avg": "lead() and the groupBy share the user_id partitioning — ONE exchange total; the weighted sum is bigint cents x micros.",
    "bm25_topk": "Token filter lands before the (doc,token) aggregation; df and the 1-row corpus stats broadcast; scoring is bigint floor-division.",
    "attribution_last_touch": "LOCF credit via last_value IGNORE NULLS over rows-to-1-preceding: one user_id exchange, then a tiny channel rollup.",
    "basket_type_lift": "DISTINCT (user,type) collapses the stream first; the pair self-join is bounded by the type dimension per user, never events squared.",
    "robust_outliers_mad": "Two percentile passes + broadcast joins back; all thresholds integer (2x-median / 2x-MAD half-unit trick).",
    "dedup_passages": "Chunking is a per-row transform over the word array (no shuffle to form passages); exchanges only on the passage hash and the final doc rollup.",
    "text_top_bigrams": "Pairs come from arrays_zip of the word array with its own tail inside one codegen stage; the two exchanges are the standard two-phase distinct-aggregate (partial counts collapse per task before either).",
    "similarity_pq_adc": "Codebook and query LUT ride in the Arrow-UDF closure (bounded collects); encode + ADC are ONE vectorized ArrowEvalPython stage per batch; TakeOrderedAndProject ends it — the embedding table is never shuffled. (Measured: 3x over interpreted HOFs.)",
    "similarity_truncated_rerank": "Two TakeOrderedAndProject cuts: coarse distance on the 16-dim prefix, exact rerank of the 50 survivors — no global sort, corpus never shuffled.",
    "text_bigram_lm_score": "Bigram pairs zip map-side; the LM is two keyed counts; scoring is two equi-joins plus one per-doc aggregate — no window, no cartesian.",
    "timeseries_ohlc_daily": "open/close resolve inside the same (event_type, day) partitioning the aggregation consumes — one real exchange for four analytics.",
    "events_gap_islands": "The islands constant (day - row_number) computes in the distinct's own partitioning; both rollups stay on the user key.",
    "experiment_ab_ttest": "One scan to a SINGLE row of integer sufficient statistics via conditional partial aggregation; the t statistic is pure arithmetic on that row.",
    "profile_orders": "Six columns profiled from ONE scan: every statistic partial-aggregates; the Expand is the exact-distinct price (exact=False drops it for HLL++ sketches at 100 TB).",
    "text_normalize": "Map-only canonicalization: regex stages in whole-stage codegen around a single ArrowEvalPython hop (the NFC UDF) — zero exchanges.",
    "cdc_resolution_probe": "The CDC winner decision is ONE keyed window (seq desc, delete-beats-upsert, unique-id tiebreak) — a single user_id exchange, the same shape the warehouse apply commits.",
    "ingest_gate_replay_two_epochs": "Admission math end-to-end: band-bucket equi-join candidates, shingle-array verify joins, parity epochs, one final two-row keyed aggregate — no all-pairs term anywhere.",
    "attribution_position_weighted": "Running purchase-count and journey position/size windows share the user_id key prefix; credit is a codegen CASE; one tiny channel rollup ends it.",
    "dedup_minhash_estimate_audit": "Signature-slot agreement joins the O(docs) sigs table twice BY KEY; sketch estimate and exact Jaccard are integer arithmetic in the same projection.",
    "embedding_kmeans_2iter": "Each Lloyd iteration = K-row centroid broadcast + per-row integer fold (no corpus shuffle) then a K*64-row partial-sum exchange — the plan pair repeats unchanged at any corpus size.",
    "bloom_index_point_lookup": "The final fact scan carries the bloom-surviving partition IN-filter plus the exact key predicate — on a partitioned layout both push to the scan, pruned partitions never open.",
    "dedup_ppjoin_exact": "Candidates come from the equi-join on PREFIX shingles only (df-ranked window, per-doc partitioning); the verify re-joins candidates to the shingle table BY DOC KEY — the exhaustive all-shared-shingle join never appears.",
    "stats_bootstrap_poisson": "The 32x replicate fan-out (explode) and the Poisson-threshold CASE run map-side inside one codegen stage; partial aggregation collapses to 32 rows per task BEFORE the only exchange.",
    "dq_distribution_drift": "One scan, conditional partial aggregation onto the category domain, a |categories|-row window for the totals — the epoch cut is a pushed literal comparison, not a join.",
    "experiment_cuped_adjusted": "Per-user conditional aggregate (one user_id exchange) feeds BOTH the 2-row arm aggregate and the 1-row pooled moments; they combine via a bounded broadcast — theta never touches per-user rows.",
    "privacy_dp_laplace_counts": "Noise is a per-row expression over the O(classes) aggregate output — md5, the CASE-branch ln, and the rounding all inside one projection; no second pass over the corpus.",
    "similarity_rrf_fusion": "Both rankers keep their plans (posting aggregation + broadcast stats; broadcast query vector + TakeOrdered); the fusion is a full-outer join of two k-row frames.",
    "similarity_ann_multiprobe": "ONE scan projection carries (v, nrm, bucket) — hyperplanes are literal doubles, not expression subtrees; the 37-key probe set broadcasts from one row into a single bucket equi-join; rerank ends in TakeOrderedAndProject.",
    "stats_ks_drift": "One scan partial-aggregates onto the bounded distinct-cents domain; the single-partition cumulative window runs over |domain| rows, not |data| rows; D's max is all-integer.",
    "bucketed_join_scan": "ZERO Exchange nodes end-to-end: both scans read `Bucketed: true`, the SortMergeJoin and the per-order HashAggregate reuse the bucket clustering (the groupBy key IS the bucket key).",
    "dedup_semantic_scaled": "Same shape as dedup_semantic with K = n div 64: K-row centroid broadcasts per Lloyd assign (never a corpus shuffle), cluster-keyed pair equi-join, K-row final aggregate — the K knob changes only the broadcast's row count. The K-seed cut is a TakeOrderedAndProject (distributed partial top-K), NOT a single-partition rank window.",
    "corpus_curation": "The token-budget cut is two-pass: a bounded quality-bp histogram (its cumulative window runs over <=10001 rows) broadcasts per-bucket offsets back; past-budget buckets drop map-side; the exact running sum is PARTITIONED BY quality_bp — no unbounded single-partition window anywhere.",
    "sketch_kmv_setops": "Exact union/intersection counters are one plain aggregate; the KMV state (kth, jacc_num) comes from orderBy(h).limit(K) — a distributed TakeOrdered bottom-K, the per-partition merge a theta-sketch framework does; the two 1-row frames combine via broadcast.",
    "dedup_image_phash": "Decode+dHash is ONE Arrow-batched map pass (four 16-bit band ints per payload); candidates are a (band,value) equi-join over 4 rows/doc — sum(bucket^2), never all-pairs; the Hamming verify joins candidates back BY DOC KEY; banding is pigeonhole-lossless at T=3.",
    "similarity_image_phash_topk": "The query's 4 (band,value) rows broadcast into the corpus band equi-join (4-bucket point probe); the Hamming rank over the bounded candidate set is a TakeOrderedAndProject(k); the 1-row query hash rides a broadcast.",
    "text_bpe_encode": "One corpus tokenization feeds the cached word-frequency table; the 16-merge encode chain is a single map-side projection over DISTINCT words; the word->pieces mapping broadcasts into the token stream; one doc-keyed aggregate ends it.",
    "graph_triangles_lsh": "Bucket assignment is map-side literal-plane folds; edges are band+bucket equi-joins; the wedge join and canonical-pair closure are equi-joins; the 1-row global count rides a broadcast; TakeOrderedAndProject(20) ends it.",
    "dedup_audio_fingerprint": "Same banded-Hamming shape as dedup_image_phash with the audio energy-delta kernel: one Arrow-batched fingerprint pass, (band,value) equi-join candidates, doc-keyed Hamming verify — never all-pairs.",
    "similarity_audio_fp_topk": "The audio twin of the image topk: the query's 4 (band,value) rows broadcast into the corpus band equi-join (4-bucket point probe); Hamming rank is a TakeOrderedAndProject(k).",
    "dedup_cross_modal_agreement": "Both pair generators keep their dedup rows' equi-join plans (shingle-keyed Jaccard, band-keyed Hamming); the agreement combine is ONE pair-keyed full-outer equi-join over two verified-pair sets; jacc_bp is integral DIV, no float truncation.",
    # dedup_split_leakage is intentionally NOT captured: its plan
    # embeds the CC loop's full iterative lineage (thousands of lines,
    # like dedup_clusters) — the audit's own cost is one join + one
    # keyed aggregate on cluster_id on top of it.
    # matview_incremental_replay is NOT captured either: the returned
    # frame is just the MV read — the interesting plans are the write
    # path's (merge partial + delta agg), pinned in tests instead.
    # join_matview_incremental_replay follows the same rule (returned
    # frame = MV read + groupBy; the delta plans are pinned in
    # tests/test_join_matview.py).
}

HEADER = """# Physical plans (captured)

`df.explain("formatted")` output for representative queries, captured at
sf0.001 by `tools/capture_plans.py` — the evidence behind the scale claims in
README / docs/SCALING.md. Regenerate: `python tools/capture_plans.py`.
"""


def main() -> None:
    from qms_datawarehouse_spark.plans.registry import REGISTRY
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    out = [HEADER]
    from qms_datawarehouse_spark.planaudit import PRE_CHECKPOINT_PLANS

    for name, note in PICKS.items():
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        if name in PRE_CHECKPOINT_PLANS:
            # eager-checkpoint queries return Scan ExistingRDD —
            # capture the REAL plan checkpoint_result recorded
            text = PRE_CHECKPOINT_PLANS[name].strip()
            note = note + " (pre-checkpoint plan — the returned frame is an eager localCheckpoint)"
        else:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue().strip()
        out.append(f"## {name}\n\n{note}\n\n```\n{text}\n```\n")
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
