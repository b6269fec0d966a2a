"""Similarity search over embedding columns.

- ``similarity_topk_cosine``: brute-force top-k against a query
  vector — the exact baseline. Distributed shape: broadcast the query
  vector, score every row (one scan, no shuffle), TakeOrdered top-k.
- ``similarity_ann_lsh``: random-hyperplane LSH bucketing — the scale
  path. Hyperplanes are derived deterministically from md5, so bucket
  assignment is reproducible; search cost drops from O(N) to
  O(bucket). Registered rows-only (the bucketing math is not worth
  expressing in SQL; the exact baseline above is the oracle-checked
  kernel).

At 100 TB: the query vector (or batch of query vectors) broadcasts;
candidate scoring is a map-side zip_with fold inside codegen; top-k
is a per-partition heap + driver merge (TakeOrderedAndProject) — no
global sort, no shuffle of the embedding table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

TOP_K = 10
QUERY_VEC_ID = 0
N_HYPERPLANES = 8


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@query(
    "similarity_topk_cosine",
    f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
                   AS nrm
        FROM embeddings
    ),
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT vec_id, label, round(cos, 4) AS cosine FROM (
        SELECT e.vec_id, e.label,
               list_sum(list_transform(range(1, 65), i -> e.v[i] * q.qv[i]))
                   / (e.nrm * q.qn) AS cos
        FROM e, q WHERE e.vec_id <> {QUERY_VEC_ID}
    )
    ORDER BY cos DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query vector, score all,
    TakeOrdered(k). The exact-ANN baseline."""
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("cos", cos)
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "label", F.round("cos", 4).alias("cosine"))
    )


def lsh_bucketed(embeddings: DataFrame, n_planes: int = N_HYPERPLANES) -> DataFrame:
    """Assign each vector a sign-pattern bucket from deterministic
    md5-derived random hyperplanes.

    Hyperplane ``j``'s component ``i`` is ``hash01(md5("j:i")) - 0.5``
    — reproducible everywhere, no stored model. Vectors whose bucket
    matches a query's bucket (or its near neighbors) are the ANN
    candidate set.
    """
    dim = 64
    planes = []
    for j in range(n_planes):
        comps = [
            F.conv(F.md5(F.lit(f"{j}:{i}").cast("binary")).substr(1, 8), 16, 10).cast(
                "double"
            )
            / F.lit(float(16**8))
            - 0.5
            for i in range(dim)
        ]
        planes.append(F.array(*comps))
    v = F.col("embedding").cast("array<double>")
    bits = [
        F.when(_dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return embeddings.withColumn("bucket", F.concat(*bits))


@query("similarity_ann_lsh", None)  # rows-only: bucketing demo + self-check
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: hyperplane sign buckets → per-bucket stats.
    The scale path for similarity search — candidate generation
    becomes a bucket equi-join instead of a full scan per query."""
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    bucketed = lsh_bucketed(embeddings)
    return bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )
