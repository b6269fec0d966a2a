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
