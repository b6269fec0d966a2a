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


def test_lsh_buckets_deterministic_and_bounded(spark):
    """similarity_ann_lsh is rows-only (no SQL oracle) — pin its
    contract here: bucket assignment is deterministic across runs,
    every vector lands in exactly one of ≤ 2^n_planes buckets, and
    bucketing groups genuinely similar vectors (mean intra-bucket
    cosine of the query's bucket exceeds the corpus mean)."""
    from pyspark.sql import functions as F

    from qms_datawarehouse_spark.operators.similarity import (
        _dot,
        lsh_bucketed,
    )

    (embeddings,) = tables(spark, SF_DIR, "embeddings")
    b1 = lsh_bucketed(embeddings).select("vec_id", "bucket")
    b2 = lsh_bucketed(embeddings).select("vec_id", "bucket")
    assert b1.exceptAll(b2).isEmpty()  # deterministic

    n_vectors = embeddings.count()
    stats = b1.agg(
        F.countDistinct("bucket").alias("nb"), F.count("*").alias("n")
    ).first()
    assert stats["n"] == n_vectors  # every vector bucketed once
    assert stats["nb"] <= 256  # 2^8 hyperplane sign patterns

    # similarity structure: query vector's bucket-mates are closer to
    # it than the corpus average
    e = lsh_bucketed(embeddings).select(
        "vec_id", "bucket", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).first()
    qv, qb = q["v"], q["bucket"]
    cos = _dot(F.col("v"), F.array(*[F.lit(x) for x in qv]))
    scored = e.filter(F.col("vec_id") != 0).select(
        "bucket", cos.alias("dot")
    ).persist()
    mean_all = scored.agg(F.avg("dot")).first()[0]
    mates = scored.filter(F.col("bucket") == qb)
    if mates.take(1):  # bucket may hold only the query at tiny SF
        mean_bucket = mates.agg(F.avg("dot")).first()[0]
        assert mean_bucket > mean_all
    scored.unpersist()


def test_train_codebook_matches_numpy_reference(spark):
    """Independent oracle: the DataFrame-native Lloyd's must produce
    the same centroids as a from-scratch NumPy implementation of the
    identical algorithm (cosine argmax, id tie-break, empty cells keep
    previous centroid) to float tolerance — the iterative-algorithm
    analog of the DuckDB oracles, run where tolerance can be explicit
    instead of hash-exact."""
    import numpy as np

    (embeddings,) = tables(spark, SF_DIR, "embeddings")
    rows = sorted(
        ((r["vec_id"], np.array(r["embedding"], dtype=np.float64))
         for r in embeddings.select("vec_id", "embedding").collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    nrm = np.linalg.norm(X, axis=1)

    C = X[ids < N_CELLS].copy()
    cn = nrm[ids < N_CELLS].copy()
    for _ in range(3):
        cos = (X @ C.T) / np.outer(nrm, cn)  # (n, k)
        # argmax with lowest-cent-id tie-break == np.argmax semantics
        assign = np.argmax(cos, axis=1)
        newC = C.copy()
        for c in range(N_CELLS):
            members = X[assign == c]
            if len(members):
                newC[c] = members.mean(axis=0)
        C, cn = newC, np.linalg.norm(newC, axis=1)

    got = {
        r["cent_id"]: (np.array(r["cv"]), r["cnrm"])
        for r in train_codebook(embeddings, iterations=3).collect()
    }
    assert set(got) == set(range(N_CELLS))
    for c in range(N_CELLS):
        gv, gn = got[c]
        np.testing.assert_allclose(gv, C[c], rtol=0, atol=1e-9)
        assert abs(gn - cn[c]) < 1e-9
