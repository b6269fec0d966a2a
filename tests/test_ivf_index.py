"""Materialized IVF layout: partition-pruned probes must equal the
row-filter IVF query, and the probe scan must actually prune cell
partitions (PartitionFilters in the physical plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.similarity import (
    IVF_CELL_COL,
    QUERY_VEC_ID,
    build_ivf_index,
    ivf_probe_indexed,
    similarity_ivf_probe,
)
from qms_datawarehouse_spark.plans.registry import tables

SF = "/root/testdata/sf0.001"


def test_indexed_probe_matches_query_path(spark, warehouse):
    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings)

    qv = embeddings.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    got = ivf_probe_indexed(warehouse, qv, exclude_vec_id=QUERY_VEC_ID).collect()
    want = similarity_ivf_probe(spark, SF).collect()

    got_rows = [(r["vec_id"], r["label"], r["cell_id"], r["cosine"]) for r in got]
    want_rows = [(r["vec_id"], r["label"], r["cell_id"], r["cosine"]) for r in want]
    assert got_rows == want_rows


def test_zero_norm_query_raises_loudly(spark, warehouse):
    """Round-13 degenerate-input audit: a zero query vector used to
    die with a bare ZeroDivisionError inside the driver-side nprobe
    fold — cosine against it is undefined, so fail with a message."""
    import pytest

    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf0")
    with pytest.raises(ValueError, match="zero norm"):
        ivf_probe_indexed(warehouse, [0.0] * 64, table="ivf0")


def test_probe_scan_prunes_cell_partitions(spark, warehouse):
    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf2")
    qv = embeddings.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    plan = ivf_probe_indexed(warehouse, qv, table="ivf2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert IVF_CELL_COL in plan.split("PartitionFilters", 1)[1][:300], (
        "cell filter did not reach PartitionFilters:\n" + plan[:2000]
    )
