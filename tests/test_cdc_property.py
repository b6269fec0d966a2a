"""Property-based CDC apply semantics (hypothesis): for ANY sequenced
change feed, split into ANY batching and delivered in ANY order —
including a replayed batch at the end — the warehouse must equal the
reference model: per key, the operation with the HIGHEST sequence
wins; a winning delete leaves no row; a late upsert never resurrects
a deleted key (tombstone suppression); and the tombstone table holds
each deleted key's max delete sequence. Sequences are unique by
construction, so the model is arrival-order-free and exact."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qms_datawarehouse_spark.operators.cdc import (
    apply_changes,
    tombstone_table,
)
from qms_datawarehouse_spark.warehouse import ParquetWarehouse

KEYS = ["a", "b", "c", "d"]

op_strategy = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["upsert", "delete"]),
    st.integers(min_value=0, max_value=99),
)


@st.composite
def feed_strategy(draw):
    ops = draw(st.lists(op_strategy, min_size=1, max_size=10))
    # unique sequences in a hypothesis-chosen order → ties impossible,
    # so the model is exact and delivery order is irrelevant
    seqs = draw(st.permutations(range(len(ops))))
    rows = [
        (k, int(seq), op, v)
        for (k, op, v), seq in zip(ops, seqs)
    ]
    # split into 1..3 batches at hypothesis-chosen points
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(rows)),
                min_size=0,
                max_size=2,
            )
        )
    )
    bounds = [0] + cuts + [len(rows)]
    batches = [
        rows[lo:hi] for lo, hi in zip(bounds, bounds[1:]) if hi > lo
    ]
    replay_idx = draw(
        st.integers(min_value=0, max_value=max(len(batches) - 1, 0))
    )
    return batches, replay_idx


def _model(batches):
    winner: dict[str, tuple[int, str, int]] = {}
    tombs: dict[str, int] = {}
    for batch in batches:
        # per-batch winner per key (highest seq; seqs unique)
        batch_winner: dict[str, tuple[int, str, int]] = {}
        for k, seq, op, v in batch:
            cur = batch_winner.get(k)
            if cur is None or seq > cur[0]:
                batch_winner[k] = (seq, op, v)
        for k, (seq, op, v) in batch_winner.items():
            # tombstones record only deletes that WON their batch: a
            # delete superseded by a same-batch newer upsert needs no
            # memory — that upsert (stored, higher seq) already
            # shields every operation older than the delete
            if op == "delete":
                tombs[k] = max(tombs.get(k, -1), seq)
            cur = winner.get(k)
            if cur is None or seq > cur[0]:
                winner[k] = (seq, op, v)
    state = {
        k: (seq, v)
        for k, (seq, op, v) in winner.items()
        if op == "upsert"
    }
    return state, tombs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=feed_strategy())
def test_cdc_apply_matches_model(spark, tmp_path_factory, feed):
    batches, replay_idx = feed
    wh = ParquetWarehouse(spark, str(tmp_path_factory.mktemp("cdc_prop")))

    def apply(batch):
        df = spark.createDataFrame(
            batch, "_id string, _seq long, _op string, v long"
        )
        apply_changes(wh, "t", df)

    for batch in batches:
        apply(batch)
    apply(batches[replay_idx])  # at-least-once redelivery

    state, tombs = _model(batches)
    got = (
        {r._id: (r._seq, r.v) for r in wh.read("t").collect()}
        if wh.table_exists("t")
        else {}
    )
    assert got == state
    got_tombs = (
        {r._id: r._seq for r in wh.read(tombstone_table("t")).collect()}
        if wh.table_exists(tombstone_table("t"))
        else {}
    )
    assert got_tombs == tombs
