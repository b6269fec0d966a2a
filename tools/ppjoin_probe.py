"""PPJoin adversarial scale probe: measure the prefix filter's
candidate volume when replicas SHARE shingles (posting lists grow
with the corpus) instead of the sf1_probe construction (every token
suffixed per replica, so posting lists stay constant and only the
number of lists grows).

Construction (``shared`` mode): suffix every 5th token per replica.
With 3-word shingles, any shingle covering a mutated position dies
(3 of every 5), so 40% of each doc's shingles are IDENTICAL across
all replicas — their document frequency grows ×factor — while
cross-replica Jaccard sits at ~0.25 (0.4 / 1.6), far under τ=0.8, so
the TRUE pair set stays ×factor (each replica reproduces the base
corpus's internal near-dup pairs and nothing else). This is the
prefix filter's worst weather: the corpus-wide df distribution
shifts up uniformly, and the filter survives only if prefixes keep
selecting replica-LOCAL (rare) shingles over the shared (common)
ones.

Prints one JSON line per mode:
  {"mode", "factor", "n_docs_1x", "cand_1x", "cand_Nx", "true_1x",
   "true_Nx", "t_1x", "t_Nx", "ratio", "cand_growth", "true_growth"}

Verdict criteria (recorded in docs/SCALING.md): if cand_growth in
shared mode tracks ~factor (prefixes stay local), the rarest-first
prefix filter alone is sufficient and the position-filter upgrade
(PPJoin's second rule) is unnecessary; if it tracks ~factor², the
position filter goes on the roadmap.

Usage: python tools/ppjoin_probe.py [--factor 10] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"
MUTATE_PERIOD = 5  # every 5th token per replica → 40% shingles shared


def build_docs_dir(spark, base: str, factor: int, mode: str) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix=f"ppjoin_{mode}_")
    df = spark.read.parquet(os.path.join(base, "documents.parquet"))
    parts = []
    for r in range(factor):
        off = r * 10**9
        if mode == "disjoint":
            # the sf1_probe transform: every token suffixed — replicas
            # share NO shingles, posting lists constant
            text = F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{r}")
        else:
            # shared mode: suffix tokens at positions ≡ 0 (mod 5) —
            # token count invariant, 40% of shingles shared verbatim
            # across every replica
            text = F.array_join(
                F.expr(
                    "transform(split(text, ' '), (x, i) -> "
                    f"CASE WHEN i % {MUTATE_PERIOD} = 0 "
                    f"THEN concat(x, 'r{r}') ELSE x END)"
                ),
                " ",
            )
        parts.append(
            df.select(
                (F.col("doc_id") + off).alias("doc_id"),
                text.alias("text"),
                *[c for c in df.columns if c not in ("doc_id", "text")],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(min(64, 8 * factor)).write.parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def measure(spark, sf_dir: str, runs: int):
    """(best wall time of the full query, candidate count, true-pair
    count) — candidates from the REAL shared prefix stage."""
    from pyspark.sql import functions as F

    from qms_datawarehouse_spark.operators.dedup import (
        _ppjoin_prefix_candidates,
        _shingled,
        dedup_ppjoin_exact,
    )

    best = float("inf")
    n_true = None
    for _ in range(runs):
        t0 = time.monotonic()
        n_true = dedup_ppjoin_exact(spark, sf_dir).count()
        best = min(best, time.monotonic() - t0)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = _shingled(docs).select(
        "doc_id", F.explode("shingles").alias("t")
    ).persist()
    _, cands, prefix = _ppjoin_prefix_candidates(tok)
    n_cand = cands.count()
    prefix.unpersist()
    tok.unpersist()
    return round(best, 2), n_cand, n_true


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--modes", nargs="*", default=["disjoint", "shared"])
    args = ap.parse_args(argv)

    from qms_datawarehouse_spark.session import get_spark

    spark = get_spark("ppjoin-probe", master=args.master, shuffle_partitions=32)
    n_docs = spark.read.parquet(
        os.path.join(BASE, "documents.parquet")
    ).count()
    t1, c1, tr1 = measure(spark, BASE, args.runs)
    for mode in args.modes:
        scaled = build_docs_dir(spark, BASE, args.factor, mode)
        tN, cN, trN = measure(spark, scaled, args.runs)
        print(
            json.dumps(
                {
                    "mode": mode,
                    "factor": args.factor,
                    "n_docs_1x": n_docs,
                    "cand_1x": c1,
                    f"cand_{args.factor}x": cN,
                    "true_1x": tr1,
                    f"true_{args.factor}x": trN,
                    "t_1x": t1,
                    f"t_{args.factor}x": tN,
                    "ratio": round(tN / t1, 1) if t1 else None,
                    "cand_growth": round(cN / c1, 1) if c1 else None,
                    "true_growth": round(trN / tr1, 1) if tr1 else None,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
