"""As-of join: for each left row, the latest right row at-or-before it.

The reference has no joins at all (SURVEY §2.4) — this is part of the
beyond-reference relational surface. Spark lacks a native as-of join,
so we compose one from built-ins (no Python in the row path):

  union the keyed timelines, window-order by (key, time, side),
  carry the last right-row values forward with `last(..., ignorenulls)`,
  keep left rows.

One shuffle on (key) — the same cost as the equivalent sort-merge
join — and it handles arbitrarily large both sides (no per-group
materialization, unlike an applyInPandas merge_asof). A `tolerance`
bounds staleness like pandas' merge_asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    tolerance=None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join each left row to the most recent right row (direction=
    backward) or the next right row (forward) on time column ``on``,
    optionally matching equality keys ``by`` first.

    Right payload columns appear with ``right_prefix`` unless they
    already carry it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = by or []

    payload = [c for c in right.columns if c != on and c not in by]
    rp = [c if c.startswith(right_prefix) else f"{right_prefix}{c}" for c in payload]

    lhs = left.withColumn("_side", F.lit(1))
    for c, pc in zip(payload, rp):
        lhs = lhs.withColumn(pc, F.lit(None).cast(dict(right.dtypes)[c]))
        lhs = lhs.withColumn(f"_r_{pc}", F.lit(None).cast(dict(right.dtypes)[c]))
    rhs = right.withColumn("_side", F.lit(0))
    for c, pc in zip(payload, rp):
        rhs = rhs.withColumnRenamed(c, f"_r_{pc}")
        rhs = rhs.withColumn(pc, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.withColumn("_r_time", F.col(on))
    lhs = lhs.withColumn("_r_time", F.lit(None).cast(dict(left.dtypes).get(on) or dict(right.dtypes)[on]))

    cols = lhs.columns
    unioned = lhs.select(*cols).unionByName(rhs.select(*cols))

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
    else:
        w = Window.partitionBy(*by).orderBy(F.col(on).desc(), F.col("_side").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )

    filled = unioned
    for pc in rp:
        filled = filled.withColumn(pc, F.last(F.col(f"_r_{pc}"), ignorenulls=True).over(w))
    filled = filled.withColumn("_matched_time", F.last(F.col("_r_time"), ignorenulls=True).over(w))

    out = filled.filter(F.col("_side") == 1)
    if tolerance is not None:
        in_tol = (
            F.abs(F.col(on).cast("double") - F.col("_matched_time").cast("double"))
            <= F.lit(tolerance)
        )
        for pc in rp:
            out = out.withColumn(pc, F.when(in_tol, F.col(pc)))
    drop = ["_side", "_matched_time", "_r_time"] + [f"_r_{pc}" for pc in rp]
    return out.drop(*drop)
