"""Release helper for eager localCheckpoint chains.

Iterative operators (connected-components label propagation, Lloyd
refinement) truncate per-round lineage with
``df.localCheckpoint(eager=True)``. Truncation fixes plan accretion,
but each round's checkpoint blocks stay pinned in executor storage for
the life of the session unless explicitly dropped — a leak for
long-running jobs that repeat these operators (each round holds a full
copy of the working set).

``release_local_checkpoint`` frees a round's blocks once the NEXT
round's checkpoint is materialized. Ordering is load-bearing: the
lineage is gone, so a released checkpoint can never be recomputed —
anything still reading it fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
Callers must release strictly behind the materialization frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Drop the executor-storage blocks behind an eagerly
    localCheckpoint-ed DataFrame. Returns True when blocks were
    released, False when the plan wasn't a bare checkpoint scan (or the
    py4j surface didn't cooperate) — in that case nothing is freed and
    nothing breaks; the blocks just stay until session end as before.

    Only the DataFrame RETURNED by ``localCheckpoint`` qualifies: its
    logical plan is a ``LogicalRDD`` whose ``rdd()`` is the block-backed
    RDD. Derived frames (selects/joins over it) don't expose the handle.
    """
    try:
        plan = df._jdf.queryExecution().logical()
        if not plan.getClass().getName().endswith("LogicalRDD"):
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:  # noqa: BLE001 — best-effort; never fail the job over cleanup
        return False
