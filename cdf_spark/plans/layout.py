"""Physical layout levers: bucketing for co-located joins, salting for
skewed aggregations.

SCALE.md's deployment levers made concrete:

- **Bucketing**: persist both sides of a recurring fact-fact join
  bucketed by the join key; subsequent joins read co-located buckets
  with NO shuffle on either side (verified by plan inspection in
  tests). This is Spark's answer to the reference's co-located
  partition authority.
- **Salting**: a hot key overwhelms one reducer in a groupBy. AQE
  splits skewed JOIN partitions but not aggregations; two-phase
  salted aggregation bounds any reducer at 1/salt of the hot key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket specs Spark
    plans a SortMergeJoin with ZERO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def join_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan (test hook)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange hashpartitioning" in line)


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation under key skew.

    Phase 1 groups by (keys, salt-bucket) — the hot key spreads over
    `salt` reducers; phase 2 merges the partials by keys alone. Only
    decomposable aggregates are admitted (sum/count/min/max): avg must
    be expressed as sum+count by the caller.

    aggs: output_name -> "fn(col)" with fn in sum|count|min|max.
    """
    import re

    phase1_aggs = []
    phase2_aggs = []
    for out, spec in aggs.items():
        m = re.fullmatch(r"(sum|count|min|max)\((\w+|\*)\)", spec.strip())
        if not m:
            raise ValueError(f"aggregate {spec!r} not decomposable (use sum/count/min/max)")
        fn, col = m.groups()
        partial = f"_p_{out}"
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(partial))
            phase2_aggs.append(F.sum(partial).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(partial))
            phase2_aggs.append(F.min(partial).alias(out))
        else:
            phase1_aggs.append(F.max(col).alias(partial))
            phase2_aggs.append(F.max(partial).alias(out))

    salted = df.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(salt)))
    partials = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partials.groupBy(*keys).agg(*phase2_aggs)


def broadcast_threshold_hint(df: DataFrame, small: bool) -> DataFrame:
    """Explicit join-side hint (broadcast / shuffle-merge)."""
    return F.broadcast(df) if small else df.hint("merge")


def zorder_value(df: DataFrame, by: list[str], bits: int = 16) -> Column:
    """Bit-interleaved z-value over up to 4 numeric columns: each is
    min-max scaled (one tiny agg over `df`) to a `bits`-wide rank,
    then interleaved into one long. Sorting/range-partitioning on the
    result gives every cluster column selective per-file bounds — the
    multi-dimensional data-skipping layout (Delta OPTIMIZE ZORDER BY /
    Iceberg zorder sort order). Shared by both formats' rewrites."""
    if not 1 <= len(by) <= 4:
        raise ValueError("zorder supports 1-4 cluster columns")
    missing = [c for c in by if c not in df.columns]
    if missing:
        raise ValueError(f"zorder columns not in DataFrame: {missing}")
    stats = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in by for n, f in (("min", F.min), ("max", F.max))]
    ).first()
    scaled = []
    for c in by:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        span = float(hi) - float(lo) if lo is not None and hi is not None else 0.0
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
        else:
            frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            scaled.append(
                F.least(
                    F.floor(frac * ((1 << bits) - 1)).cast("long"),
                    F.lit((1 << bits) - 1).cast("long"),
                )
            )
    ncols = len(by)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1).cast("long"))
            # PySpark's shiftleft() wrapper only takes a Python-int
            # shift; the SQL function accepts a column
            z = z.bitwiseOR(
                F.call_function("shiftleft", bit, F.lit(i * ncols + j).cast("int"))
            )
    return z
