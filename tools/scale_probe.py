"""Scale-sensitivity probe: measure how the heavy operators' runtime
grows on a synthetic 5× corpus built from sf0.1 (documents/embeddings
replicated with offset ids; texts perturbed so replicas are near-dups,
not exact dups).

A near-5× runtime ratio is evidence the plan is linear in the corpus
(scan/shuffle-bound); a ~25× ratio exposes pair-quadratic work —
expected for the fixed-bucket knn join (pairs ∝ N²/B: at real scale B
grows with N, here it is pinned by the shared oracle constants).

Usage:
    python tools/scale_probe.py [--runs 2] [--out /tmp/scale_probe.json]
Prints one JSON line per op: {"op", "t_1x", "t_5x", "ratio"}.
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

SF1 = "/root/testdata/sf0.1"
REPLICAS = 5

PROBE_OPS = [
    "curation_stratified_sample",
    "curation_pack_sequences",
    "text_pii_redact",
    "dedup_exact",
    "dedup_minhash_lsh",
    "curation_contamination",
    "similarity_knn_join_lsh",
    "text_repetition",
    "curation_domain_mix",
    "dedup_passages",
    "similarity_pq_adc",
    "similarity_ivfpq",
    "curation_shuffle_shards",
    "text_normalize",
    "curation_sample_exact_k",
    # round-4 document/embedding operators
    "text_bigram_lm_score",
    "similarity_truncated_rerank",
    "curation_temperature_mix",
    # profile_orders probes the orders table, which the scaled dir
    # (documents/embeddings only) does not replicate — not probed here
]


def build_scaled_dir(spark, base: str, factor: int) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix=f"scale{factor}_")
    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    n_docs = docs.count()
    n_vecs = emb.count()
    doc_parts = []
    emb_parts = []
    for r in range(factor):
        off = r * max(n_docs, n_vecs) * 10
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                # perturb each replica so copies are near-dups, not
                # byte-identical (exact dups would inflate candidate
                # pairs artificially)
                F.concat(F.col("text"), F.lit(f" r{r}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"), "embedding", "label"
            )
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    d.repartition(8).write.parquet(os.path.join(out, "documents.parquet"))
    e.repartition(8).write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args(argv)

    from qms_datawarehouse_spark.plans import queries_map
    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark("scale-probe", master=args.master, shuffle_partitions=32)
    registry = queries_map()
    scaled = build_scaled_dir(spark, SF1, REPLICAS)

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
        for op in PROBE_OPS:
            t1 = timed(op, SF1)
            t5 = timed(op, scaled)
            row = {
                "op": op,
                "t_1x": t1,
                "t_5x": t5,
                "ratio": round(t5 / t1, 1) if t1 > 0 else None,
            }
            results.append(row)
            print(json.dumps(row))
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"replicas": REPLICAS, "base": SF1, "results": results}, f
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
