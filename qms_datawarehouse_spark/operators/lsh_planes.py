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
