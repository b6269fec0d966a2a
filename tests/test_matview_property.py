"""Property-based MV maintenance (hypothesis): for ANY sequence of
keyed upsert epochs — amounts drawn with NULLs and zeros on purpose,
group membership allowed to move — refreshing after every epoch must
leave the MV hash-equal to a one-shot recompute over the final base,
with exact SQL sum semantics (an all-NULL group's sum is NULL, a
zero-sum group's is 0). This is the algebraic closure of the round-12
(sum, non-null count) pair: the example-based tests pin the four
canonical transitions; this pins arbitrary interleavings of them
across multiple incremental merges, in both MV layouts."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.matview import (
    create_matview,
    refresh_matview,
)
from qms_datawarehouse_spark.operators.merge import merge_upsert
from qms_datawarehouse_spark.warehouse import ParquetWarehouse

KEYS = [f"k{i}" for i in range(6)]
GROUPS = ["g0", "g1", "g2"]
T0 = dt.datetime(2024, 1, 1)

# per epoch: a set of upserts, one row per key (dict → no in-batch
# tie-breaks to model), amount None/0 weighted in deliberately
epoch_strategy = st.dictionaries(
    st.sampled_from(KEYS),
    st.tuples(
        st.sampled_from(GROUPS),
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    ),
    min_size=1,
    max_size=6,
)


def _expected(state):
    """SQL GROUP BY over the final key→(group, amount) state:
    n = rows, sum = NULL iff no non-null amounts."""
    out: dict[str, tuple[int, int | None]] = {}
    by_group: dict[str, list] = {}
    for _k, (g, a) in state.items():
        by_group.setdefault(g, []).append(a)
    for g, amounts in by_group.items():
        nn = [a for a in amounts if a is not None]
        out[g] = (len(amounts), sum(nn) if nn else None)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    epochs=st.lists(epoch_strategy, min_size=2, max_size=3),
    mv_buckets=st.sampled_from([None, 4]),
)
def test_refresh_sequence_matches_recompute(
    spark, tmp_path_factory, epochs, mv_buckets
):
    wh = ParquetWarehouse(spark, str(tmp_path_factory.mktemp("prop_mv")))

    def _batch(epoch, i):
        return spark.createDataFrame(
            [
                {
                    "_id": k,
                    "grp": g,
                    "amount": a,
                    "updated_at": T0 + dt.timedelta(hours=i),
                }
                for k, (g, a) in sorted(epoch.items())
            ],
            "_id string, grp string, amount long, updated_at timestamp",
        )

    state: dict[str, tuple[str, int | None]] = {}
    merge_upsert(wh, "fact", _batch(epochs[0], 0), n_buckets=8)
    state.update(epochs[0])
    create_matview(
        wh, "mv", "fact", ["grp"], ["amount"], n_buckets=mv_buckets
    )
    for i, epoch in enumerate(epochs[1:], start=1):
        merge_upsert(wh, "fact", _batch(epoch, i), n_buckets=8)
        state.update(epoch)
        mode = refresh_matview(wh, "mv")
        assert mode in ("incremental", "fresh"), mode

    got = {
        r["grp"]: (r["_mv_n"], r["amount_sum"])
        for r in wh.read("mv").collect()
    }
    assert got == _expected(state)
