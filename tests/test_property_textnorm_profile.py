"""Property tests (hypothesis) for the corpus-governance additions:
normalize_text against an independent stdlib model (unicodedata + re)
over arbitrary unicode, and profile_table invariants over arbitrary
small tables.
"""

from __future__ import annotations

import re
import unicodedata

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CTRL = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_WS = re.compile(r"[ \t\n\r\f]+")


def _model_normalize(t: str | None) -> str | None:
    """Independent reimplementation: control strip → NFC → whitespace
    collapse → trim (spaces only, matching F.trim). Controls first —
    NFC-then-strip leaves decomposed pairs when a control separated a
    base from its combining mark (the original falsifying example:
    'a\\x1f\\u0300')."""
    if t is None:
        return None
    out = _CTRL.sub("", t)
    out = unicodedata.normalize("NFC", out)
    out = _WS.sub(" ", out)
    return out.strip(" ")


text_strategy = st.one_of(
    st.none(),
    st.text(max_size=60),  # full unicode minus surrogates
    st.text(
        alphabet=" \t\n\r\f\x00\x08\x0b\x1f\x7fabcé́ä̈",
        max_size=40,
    ),  # adversarial: controls, whitespace runs, combining marks
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(text_strategy, min_size=1, max_size=25))
def test_normalize_matches_stdlib_model(spark, texts):
    from qms_datawarehouse_spark.operators.textops import normalize_text

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    want = {i: _model_normalize(t) for i, t in enumerate(texts)}
    assert got == want
    # idempotence (on the model, which the engine just matched)
    for v in want.values():
        assert _model_normalize(v) == v


row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6)),
    st.one_of(st.none(), st.text(max_size=8)),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_strategy, min_size=1, max_size=30))
def test_profile_invariants(spark, rows):
    from qms_datawarehouse_spark.operators.profile import profile_table

    df = spark.createDataFrame(rows, "k long, s string")
    prof = {r.col_name: r for r in profile_table(df).collect()}
    ks = [k for k, _ in rows if k is not None]
    ss = [s for _, s in rows if s is not None]
    assert prof["k"].n_rows == prof["s"].n_rows == len(rows)
    assert prof["k"].n_nulls == len(rows) - len(ks)
    assert prof["s"].n_nulls == len(rows) - len(ss)
    assert prof["k"].n_distinct == len(set(ks))
    assert prof["s"].n_distinct == len(set(ss))
    if ks:
        assert prof["k"].min_value == str(min(ks))
        assert prof["k"].max_value == str(max(ks))
    else:
        assert prof["k"].min_value is None and prof["k"].max_value is None
    if ss:
        assert prof["s"].min_value == min(ss)
        assert prof["s"].max_value == max(ss)
