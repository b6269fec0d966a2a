"""Pre-checkpoint plan capture for the eager-checkpoint idiom.

Queries that end with ``localCheckpoint(eager=True)`` (so they can
unpersist their big intermediate caches before returning) hand back a
``Scan ExistingRDD`` plan — which blinds every plan-inspection test:
the no-cartesian/no-BNLJ sweep passes VACUOUSLY and join-shape
assertions see nothing. ``checkpoint_result`` is the idiom packaged:
it records the real physical plan first, then checkpoints and drops
the caches. ``tests/test_plans_scale._plan`` prefers the recorded
plan, so the sweep keeps sight of checkpointed queries.

Leaf module (no registry imports) — safe to import from any operator
module during the package's circular-import window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# query name -> executed-plan string captured BEFORE checkpointing
# (with AQE this is the initial plan, isFinalPlan=false — the same
# view _plan gets for non-checkpointed queries)
PRE_CHECKPOINT_PLANS: dict[str, str] = {}


def checkpoint_result(name: str, out: DataFrame, *caches: DataFrame) -> DataFrame:
    """Record ``out``'s physical plan under ``name``, eagerly
    checkpoint it (materializing the small result), then unpersist
    the big intermediate ``caches`` it no longer needs."""
    PRE_CHECKPOINT_PLANS[name] = (
        out._jdf.queryExecution().executedPlan().toString()
    )
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out
