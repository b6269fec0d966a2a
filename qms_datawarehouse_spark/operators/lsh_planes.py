"""Deterministic random-hyperplane constants for LSH bucketing.

Leaf module (no package imports) shared by ``similarity`` (ANN
bucketing) and ``dedup`` (embedding near-dup candidates): hyperplane
``j``'s component ``i`` is ``int(md5("j:i")[:8 hex], 16) / 2^32 − 0.5``
— reproducible from the constant string alone, identical in the JVM
(``F.md5`` + ``conv``) and in Python/DuckDB (hashlib + literal), and
exactly representable because the denominator is a power of two.
"""

from __future__ import annotations

import hashlib

N_HYPERPLANES = 8
PLANE_DIM = 64

# ANN query constants shared at MODULE-EXEC time by similarity (the
# rankers) and textops (the RRF fusion oracle SQL) — leaf-hosted so
# neither import direction re-enters a partially initialized module
TOP_K = 10
QUERY_VEC_ID = 0


def plane_component(j: int, i: int) -> float:
    h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8]
    return int(h, 16) / float(16**8) - 0.5


def plane_sql_literal(j: int, dim: int = PLANE_DIM) -> str:
    """Hyperplane ``j`` as a DuckDB DOUBLE[] literal (repr round-trips
    doubles exactly)."""
    comps = [plane_component(j, i) for i in range(dim)]
    return "[" + ", ".join(repr(c) for c in comps) + "]::DOUBLE[]"


def plane_spark_literal(j: int, dim: int = PLANE_DIM) -> str:
    """Hyperplane ``j`` as a Spark-SQL ``array(...D)`` literal string.

    Same exact doubles as ``plane_sql_literal`` (repr is the shortest
    round-trip form; Spark's ``D``-suffixed literal parses it back to
    the identical bits — verified component-for-component), but built
    as ONE ``F.expr`` string instead of ``dim`` ``F.lit`` Column
    objects: each ``F.lit`` is a py4j round-trip, and constructing a
    multi-plane forest that way cost ~1.3 s of DRIVER time per query
    invocation (48 planes × 64 components measured) — pure plan-
    construction overhead, paid before Spark even sees the query."""
    comps = [plane_component(j, i) for i in range(dim)]
    return "array(" + ", ".join(f"{c!r}D" for c in comps) + ")"
