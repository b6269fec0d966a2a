"""k-means codebook training: quantization error must not increase
across Lloyd iterations, and the trained codebook must beat the seed
codebook it started from."""

from __future__ import annotations

from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.similarity import (
    N_CELLS,
    _norm,
    codebook_sse,
    train_codebook,
)
from qms_datawarehouse_spark.plans.registry import tables

from conftest import SF_DIR


def _seed_codebook(embeddings):
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    return e.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )


def test_training_reduces_quantization_error(spark):
    (embeddings,) = tables(spark, SF_DIR, "embeddings")
    seed_err = codebook_sse(embeddings, _seed_codebook(embeddings))
    trained = train_codebook(embeddings, iterations=2)
    assert trained.count() == N_CELLS
    trained_err = codebook_sse(embeddings, trained)
    assert trained_err <= seed_err + 1e-9
    # training must actually move the centroids
    one_more = train_codebook(embeddings, iterations=3)
    assert codebook_sse(embeddings, one_more) <= trained_err + 1e-9


def test_pandas_udf_cosine_matches_builtin(spark):
    """The vectorized @pandas_udf kernel must agree with the JVM-side
    zip_with fold to float tolerance."""
    from pyspark.sql import functions as F

    from qms_datawarehouse_spark.operators.similarity import (
        _dot,
        cosine_pandas_udf,
    )

    (embeddings,) = tables(spark, SF_DIR, "embeddings")
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    qrow = e.filter(F.col("vec_id") == 0).first()
    qv, qn = list(qrow["v"]), qrow["nrm"]

    builtin = F.aggregate(
        F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in qv]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (F.col("nrm") * F.lit(qn))
    cos_udf = cosine_pandas_udf()(qv)

    out = e.select(
        "vec_id",
        builtin.alias("jvm"),
        cos_udf(F.col("v")).alias("pandas"),
    ).collect()
    assert len(out) > 0
    for r in out:
        assert abs(r["jvm"] - r["pandas"]) < 1e-9, r["vec_id"]
