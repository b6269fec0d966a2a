"""Salted-join equivalence: the salted plan must return exactly the
plain join's rows, and the salt must actually spread a hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.skew import salted_join, with_salt


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 5).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(10)], "k long, label string"
    )

    plain = fact.join(dim, "k").select("row_id", "k", "v", "label")
    salted = salted_join(fact, dim, key="k", salt_source="row_id").select(
        "row_id", "k", "v", "label"
    )

    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salt_spreads_hot_key(spark):
    fact = spark.range(1000).select(
        F.col("id").alias("row_id"), F.lit(7).alias("k")
    )
    n_salts = (
        with_salt(fact, "row_id", 8)
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 8  # the hot key now occupies 8 shuffle buckets
