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


def test_update_moves_reembedded_vector_between_cells(spark, warehouse):
    """Round-13 ANN maintenance: a re-embedded vector whose new
    assignment lands in a different cell must vanish from its OLD
    cell (the eviction a naive per-cell upsert misses) and appear
    exactly once."""
    from qms_datawarehouse_spark.operators.similarity import (
        update_ivf_index,
    )

    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf_u")
    victim = 100
    before = warehouse.read("ivf_u").filter(
        F.col("vec_id") == victim
    ).first()
    delta = embeddings.filter(F.col("vec_id") == victim).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    mode, n_cells = update_ivf_index(warehouse, delta, table="ivf_u")
    assert mode == "partial" and 1 <= n_cells <= 2
    after = warehouse.read("ivf_u").filter(F.col("vec_id") == victim)
    rows = after.collect()
    assert len(rows) == 1  # no ghost row in the old cell
    assert rows[0][IVF_CELL_COL] != before[IVF_CELL_COL]  # negation moves
    # nothing else changed
    assert warehouse.read("ivf_u").count() == embeddings.count()


def test_update_empty_delta_is_noop(spark, warehouse):
    from qms_datawarehouse_spark.operators.similarity import (
        update_ivf_index,
    )

    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf_n")
    v0 = warehouse.current_version_name("ivf_n")
    empty = embeddings.limit(0)
    assert update_ivf_index(warehouse, empty, table="ivf_n") == ("noop", 0)
    assert warehouse.current_version_name("ivf_n") == v0  # no version churn


def test_update_rejects_duplicate_vec_ids_in_delta(spark, warehouse):
    """A batch carrying two rows for one vec_id (insert + re-embed,
    or plain duplicates) would write the id into two cells — the
    one-cell-per-vec_id invariant the replay row's guard protects.
    The update must refuse the batch, not split the id."""
    import pytest

    from qms_datawarehouse_spark.operators.similarity import (
        update_ivf_index,
    )

    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf_d")
    one = embeddings.filter(F.col("vec_id") == 100)
    flipped = one.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    dup = one.unionByName(flipped)
    v0 = warehouse.current_version_name("ivf_d")
    with pytest.raises(ValueError, match="distinct vec_ids"):
        update_ivf_index(warehouse, dup, table="ivf_d")
    assert warehouse.current_version_name("ivf_d") == v0  # nothing committed


def test_update_rejects_codebook_seed_rows(spark, warehouse):
    import pytest

    from qms_datawarehouse_spark.operators.similarity import (
        update_ivf_index,
    )

    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf_s")
    seed_delta = embeddings.filter(F.col("vec_id") == 3)
    with pytest.raises(ValueError, match="codebook seed"):
        update_ivf_index(warehouse, seed_delta, table="ivf_s")


def test_probe_scan_prunes_cell_partitions(spark, warehouse):
    (embeddings,) = tables(spark, SF, "embeddings")
    build_ivf_index(warehouse, embeddings, table="ivf2")
    qv = embeddings.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    plan = ivf_probe_indexed(warehouse, qv, table="ivf2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert IVF_CELL_COL in plan.split("PartitionFilters", 1)[1][:300], (
        "cell filter did not reach PartitionFilters:\n" + plan[:2000]
    )
