"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; salting is the explicit fallback for the pathological case — a
handful of keys owning a large fraction of the fact — where one
shuffle partition would otherwise dominate the stage. The reference
never meets this (Postgres owns its joins), but a 100 TB QMS fact
keyed on staff/room WILL have hot keys (a busy office is a hot
``roomId``).

Mechanics: the large side gets a deterministic salt in ``[0, n)``
derived from a high-cardinality column (xxhash64 — content-stable, so
reruns partition identically); the small side is replicated n× via a
posexplode. The join key becomes (key, salt): each hot key's rows
spread over n partitions instead of one. Cost: small side inflates n×
— keep it broadcast-sized ÷ n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_source: str, n_salt: int) -> DataFrame:
    """Deterministic salt in [0, n_salt) from a high-cardinality
    column (row id, event id) — NOT the join key, or hot keys would
    all land on one salt again."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salt)))


def replicated(df: DataFrame, n_salt: int) -> DataFrame:
    """Small side replicated once per salt value."""
    return df.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``key``, salted to spread hot
    keys across ``n_salt`` shuffle partitions. Result is identical to
    the plain join (salt columns dropped)."""
    left = with_salt(large, salt_source, n_salt)
    right = replicated(small, n_salt)
    on = [left[key] == right[key], left["_salt"] == right["_salt"]]
    joined = left.join(right, on, how).drop(right[key]).drop("_salt")
    return joined
