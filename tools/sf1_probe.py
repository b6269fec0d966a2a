"""~10× scale probe: replicate the sf0.1 fixture into a synthetic
sf≈1 directory (keys offset per replica so joins stay consistent;
document text re-tokenized per replica so replicas are NOT near-dups
of each other — the dedup pair structure scales linearly and the
measurement isolates PLAN scaling from planted-duplicate growth) and
time the top headline queries on both.

A ~10× runtime ratio is linear (scan/shuffle-bound — the plan shape
that survives 100 TB); a markedly super-linear ratio names a concrete
scaling bug. Dims (nation/region) are NOT replicated — broadcast
sides stay bounded like real dimension tables.

Usage:
    python tools/sf1_probe.py [--factor 10] [--runs 2] [--out FILE]
Prints one JSON line per op: {"op", "t_1x", "t_10x", "ratio"}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"

# top headline queries by BENCH_r05 cost (bench.py HEADLINE order),
# plus the round-6 additions whose scale posture is newest
TOP_OPS = [
    "dedup_clusters",
    "flagship_staff_report",
    "dedup_minhash_lsh",
    "q2_min_cost_supplier",
    "curation_contamination",
    "similarity_ivf_probe",
    "text_repetition",
    "q5_region_revenue",
    "text_bigram_lm_score",
    "cdc_replay_two_epochs",
    # round-6 operators (pair-risk LSH family + iterative kmeans)
    "ingest_gate_replay_two_epochs",
    "dedup_minhash_estimate_audit",
    "embedding_kmeans_2iter",
    "attribution_position_weighted",
    "bloom_index_point_lookup",
    # round-7 operators (cluster-pair SemDeDup, stride-1 grams,
    # multi-probe buckets, boundary replay)
    "dedup_semantic",
    # round-8: the K∝N twin — the probe line that retires the fixed-K
    # 6.1× caveat (K grows with n, pair term stays linear)
    "dedup_semantic_scaled",
    "dedup_substring_spans",
    "similarity_ann_multiprobe",
    "watermark_late_replay",
    # round-7 second wave (map-side classifiers, DSIR, salted join,
    # bucketed keyless interval join, fixed-point PageRank, chunking)
    "quality_model_score",
    "curation_dsir_weights",
    "join_salted_skew",
    "interval_containment_join",
    "graph_pagerank_2iter",
    "text_chunking",
    # round-7 third wave (prefix-filtered exact similarity, KS drift,
    # shuffle-free bucketed join, incremental-MV replay) + the two
    # late second-wave rows without a published probe line
    "text_tokenize_ids",
    "semantic_gate_replay_two_epochs",
    "dedup_ppjoin_exact",
    "stats_ks_drift",
    "bucketed_join_scan",
    "matview_incremental_replay",
    "zorder_routed_scan",
    "dq_distribution_drift",
    "similarity_rrf_fusion",
    "similarity_mmr_rerank",
    # round-13 ANSI-audit rows (manufactured degenerates over the
    # cosine / Welch kernels)
    "similarity_zero_norm",
    "experiment_ttest_empty_arm",
    "ivf_index_incremental_replay",
    "stats_bootstrap_poisson",
    "privacy_dp_laplace_counts",
    "experiment_cuped_adjusted",
    "curation_coreset_kcenter",
    "dq_freshness_sla",
    # round-8: corpus-trained BPE (train on top-W freq table, encode
    # via broadcast mapping — both ends bounded)
    "text_bpe_encode",
    # round-8: degree-oriented triangle counting over the LSH graph
    "graph_triangles_lsh",
    # round-9: perceptual-hash near-dup over the binary payload
    # (banded Hamming LSH) + the two global-window rewrites that
    # previously had no probe line of their own
    "dedup_image_phash",
    "similarity_image_phash_topk",
    "corpus_curation",
    "sketch_kmv_setops",
    # round-10: audio-fingerprint near-dup (banded Hamming LSH over
    # the energy-profile bands — same rotation-preserving replica
    # argument as the image row) + the phash gate's stateless replay
    "dedup_audio_fingerprint",
    "phash_gate_replay_two_epochs",
    # round-10 late additions: the audio retrieval twin (4-bucket
    # point probe — expected ~1.0x, the image topk's posture) and the
    # cross-modal agreement audit (two equi-join pair generators +
    # one pair-keyed combine)
    "similarity_audio_fp_topk",
    "dedup_cross_modal_agreement",
    # round-10 late addition: join-MV maintenance through the real
    # write path (two bucketed merges + create + refresh per run)
    "join_matview_incremental_replay",
    "matview_bucketed_replay",
    "rollup_incremental_replay",
]

# per-table key columns to offset per replica (join consistency);
# nation/region copy once — dimension tables don't grow with facts
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["nation", "region"]
OFFSET = 10**9


def build_scaled_dir(spark, base: str, factor: int) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix=f"sf1x{factor}_")
    for t in COPY_ONCE:
        spark.read.parquet(os.path.join(base, f"{t}.parquet")).write.parquet(
            os.path.join(out, f"{t}.parquet")
        )
    for t, keys in KEY_COLS.items():
        df = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        if t == "documents":
            # the rotation only translates a-z: any doc with chars
            # outside [a-z ] would replicate byte-identically across
            # replicas, re-introducing the cross-replica aliasing the
            # rotation exists to prevent — fail LOUDLY rather than
            # skew the scaling verdicts silently
            n_bad = df.filter(
                ~F.coalesce(F.col("text"), F.lit("")).rlike("^[a-z ]*$")
            ).count()
            if n_bad:
                raise ValueError(
                    f"{n_bad} documents contain characters outside "
                    "[a-z ]: extend the rotation alphabet before "
                    "probing, or those replicas alias the base text"
                )
        parts = []
        for r in range(factor):
            off = r * OFFSET
            cols = []
            for c in df.columns:
                if c in keys:
                    cols.append((F.col(c) + off).alias(c))
                elif t == "documents" and c == "text":
                    # Caesar-rotate the letters by r per replica: a
                    # character BIJECTION, so token/shingle counts AND
                    # byte lengths are invariant (a true 10x corpus),
                    # every word differs across replicas (replicas are
                    # NOT near-dups of each other in shingle space),
                    # the base corpus's internal near-dup families
                    # survive the same transformation intact, AND the
                    # byte/bigram VALUE distribution stays diverse —
                    # the earlier token-suffix variant ('$1rN')
                    # injected identical 'rN' bigram mass into every
                    # document of a replica, collapsing byte-signature
                    # diversity so bigram-bag hashes (dedup_image_
                    # phash) faked a quadratic bucket densification
                    # (the r6 shingle-invariance lesson, byte edition;
                    # same class as the r8 embedding circular-shift
                    # fix)
                    assert r < 26, (
                        f"--factor {r + 1} > 26: letter rotation "
                        "wraps — replicas would alias the base text"
                    )
                    alpha = "abcdefghijklmnopqrstuvwxyz"
                    cols.append(
                        F.translate(
                            F.col("text"), alpha, alpha[r:] + alpha[:r]
                        ).alias("text")
                    )
                elif t == "events" and c == "event_id":
                    # numeric offset keeps replicas distinct AND keeps
                    # the base schema (bigint — an earlier string-
                    # concat variant silently changed the column type,
                    # so any query doing event_id % k would throw
                    # under ANSI at 10x but pass at 1x)
                    cols.append((F.col(c) + off).alias(c))
                elif t == "embeddings" and c == "embedding" and r > 0:
                    # rotation amount must stay inside the 64-dim
                    # vector: slice(embedding, r+1, 64-r) with r >= 64
                    # yields empty/garbage replicas that silently
                    # corrupt the scaling measurement
                    assert r < 64, (
                        f"--factor {r + 1} > 64: the circular-shift "
                        "replica construction only supports factors "
                        "<= 64 (one rotation per dimension)"
                    )
                    # circular-shift each replica's vectors by r
                    # dimensions: a rotation, so norms and all
                    # WITHIN-replica dot products (the internal
                    # near-dup/cluster structure) are exactly
                    # preserved, while cross-replica vectors
                    # decorrelate — identical copies made every
                    # bucket-keyed op (LSH graph, band joins) densify
                    # quadratically BY CONSTRUCTION, faking 100x
                    # candidate growth on a 10x corpus (the r6
                    # shingle-invariance lesson, embedding edition)
                    cols.append(
                        F.expr(
                            f"concat(slice(embedding, {r + 1}, "
                            f"{64 - r}), slice(embedding, 1, {r}))"
                        ).alias(c)
                    )
                elif t == "events" and c == "ts":
                    # shift each replica by 31 days: a true 10x event
                    # corpus spans 10x the time at constant density.
                    # Without the shift every time bucket gets 10x
                    # BOTH sides of any interval/window join and the
                    # probe fakes quadratic (the shingle-invariance
                    # lesson, time-domain edition)
                    cols.append(
                        (F.col(c) + F.expr(f"INTERVAL {r * 31} DAYS")).alias(c)
                    )
                else:
                    cols.append(F.col(c))
            parts.append(df.select(*cols))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        n_out = min(64, max(8, 8 * factor))
        u.repartition(n_out).write.parquet(os.path.join(out, f"{t}.parquet"))
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument(
        "--ops",
        nargs="*",
        default=None,
        help="probe only these ops (default: the TOP_OPS list)",
    )
    ap.add_argument(
        "--dir",
        default=None,
        help="reuse a prebuilt scaled dir (from a prior --keep run) "
        "instead of building one; implies --keep",
    )
    ap.add_argument(
        "--keep",
        action="store_true",
        help="keep the scaled dir after the run (its path prints to "
        "stderr) so a second leg — e.g. a different --master core "
        "count — can reuse it via --dir",
    )
    args = ap.parse_args(argv)

    from qms_datawarehouse_spark.plans import queries_map
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark("sf1-probe", master=args.master, shuffle_partitions=32)
    registry = queries_map()
    if args.dir:
        scaled = args.dir
        args.keep = True
    else:
        scaled = build_scaled_dir(spark, BASE, args.factor)
    print(f"scaled dir: {scaled}", file=sys.stderr, flush=True)

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.monotonic()
            registry[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        return round(best, 2)

    results = []
    try:
        for op in (args.ops or TOP_OPS):
            t1 = timed(op, BASE)
            t10 = timed(op, scaled)
            row = {
                "op": op,
                "t_1x": t1,
                f"t_{args.factor}x": t10,
                "ratio": round(t10 / t1, 1) if t1 > 0 else None,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(scaled, ignore_errors=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"factor": args.factor, "base": BASE, "results": results}, f
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
