"""Property-based merge semantics (hypothesis): for ANY sequence of
keyed batches, the warehouse table must equal the reference model —
per key, the row with the highest (updated_at, arrival order) wins —
and row count always equals distinct keys. This is the invariant the
reference's ON CONFLICT upsert promises (etl.py:68-75) extended with
order-aware resolution (T3)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.merge import merge_upsert
from qms_datawarehouse_spark.warehouse import ParquetWarehouse

KEYS = ["k0", "k1", "k2", "k3"]
T0 = dt.datetime(2024, 1, 1)

row_strategy = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=5),  # hours offset → updated_at
    st.integers(min_value=0, max_value=99),  # payload
)
batch_strategy = st.lists(row_strategy, min_size=0, max_size=6)


def _model_merge(batches):
    """Reference model: newest updated_at wins; on equal updated_at the
    later arrival wins (update precedence), and within a batch the
    window tiebreak keeps one deterministic row per (key, ts)."""
    state: dict[str, tuple[dt.datetime, int]] = {}
    for batch in batches:
        # in-batch: for each key keep max (updated_at); among equal ts
        # the engine's row_number over desc ts picks ONE row — model it
        # as max (ts, v) for determinism of the comparison value set
        best: dict[str, tuple[dt.datetime, int]] = {}
        for k, h, v in batch:
            ts = T0 + dt.timedelta(hours=h)
            cur = best.get(k)
            if cur is None or (ts, v) > cur:
                best[k] = (ts, v)
        for k, (ts, v) in best.items():
            cur = state.get(k)
            if cur is None or ts >= cur[0]:
                state[k] = (ts, v)
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch_strategy, min_size=1, max_size=4))
def test_merge_matches_model(spark, tmp_path_factory, batches):
    wh = ParquetWarehouse(
        spark, str(tmp_path_factory.mktemp("prop_wh"))
    )
    for batch in batches:
        if not batch:
            continue
        df = spark.createDataFrame(
            [
                {
                    "_id": k,
                    "updated_at": T0 + dt.timedelta(hours=h),
                    "v": v,
                }
                for k, h, v in batch
            ]
        ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
        merge_upsert(wh, "t", df, key="_id", order_col="updated_at")

    model = _model_merge(batches)
    if not model:
        return
    rows = {r["_id"]: (r["updated_at"], r["v"]) for r in wh.read("t").collect()}
    assert set(rows) == set(model)  # exactly the distinct keys
    for k, (ts, _v) in model.items():
        assert rows[k][0] == ts, f"key {k}: ts {rows[k][0]} != model {ts}"
