"""Batch/column statistics and deterministic dataset value hashes.

Re-expresses the reference's statistics layer
(`BatchStats`/`ColumnStats`/`TypedScalar`,
`crates/cdf-kernel/src/statistics.rs:32-90`; compute `:517`, merge
`:531`): per-column min/max/null-count profiles that serve as zone
maps for package pruning (`crates/cdf-engine/src/statistics_pruning.rs`).

The dataset *value hash* replaces the reference's byte-exact Arrow
segment hashing: Spark's task ordering is nondeterministic, so we hash
values, not bytes — per-row xxhash64 over canonicalized columns,
combined with an order- and partitioning-independent XOR aggregate.
One pass, map-side combined, no shuffle beyond the final 1-row agg;
this scales to any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dataset_value_hash(df: DataFrame, columns: list[str] | None = None) -> str:
    """Order/partitioning-independent content hash of a DataFrame.

    xor-combined xxhash64 over the row's columns (sorted by name,
    hashed in their NATIVE types — xxhash64 folds nulls and every
    atomic/nested type deterministically, and skipping the
    cast-to-string keeps the scan codegen'd and branch-free).
    Deterministic across runs, partitionings, and cluster sizes.
    """
    cols = columns or sorted(df.columns)
    row_hash = F.xxhash64(*[F.col(c) for c in cols])
    agg = df.agg(
        F.bit_xor(row_hash).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"xxh64-xor:{(agg.h or 0) & 0xFFFFFFFFFFFFFFFF:016x}:{agg.n}"


_STATS_TYPES = (
    T.NumericType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BooleanType,
)


def column_stats(df: DataFrame) -> dict[str, dict]:
    """Per-column min/max/null-count profile (one distributed pass).

    Complex types get null counts only (marked incomplete), matching
    the reference's completeness marking.
    """
    stats, _ = profile_and_hash(df, with_hash=False)
    return stats


def profile_and_hash(df: DataFrame, with_hash: bool = True) -> tuple[dict[str, dict], str | None]:
    """Column stats AND dataset value hash in a SINGLE aggregation pass
    (one job over the data instead of two — at 100 TB the scan is the
    cost, so every evidence product shares it)."""
    aggs = []
    plan: list[tuple[str, bool]] = []
    for f in df.schema.fields:
        simple = isinstance(f.dataType, _STATS_TYPES)
        plan.append((f.name, simple))
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"))
        if simple:
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
    aggs.append(F.count(F.lit(1)).alias("__rows"))
    if with_hash:
        cols = sorted(df.columns)
        row_hash = F.xxhash64(*[F.col(c) for c in cols])
        aggs.append(F.bit_xor(row_hash).alias("__vhash"))
    row = df.agg(*aggs).collect()[0].asDict()

    out: dict[str, dict] = {}
    for name, simple in plan:
        entry: dict = {
            "null_count": int(row[f"{name}__nulls"] or 0),
            "complete": simple,
        }
        if simple:
            entry["min"] = _scalar(row[f"{name}__min"])
            entry["max"] = _scalar(row[f"{name}__max"])
        out[name] = entry
    n = int(row["__rows"])
    out["__table"] = {"rows": n}
    vhash = None
    if with_hash:
        vhash = f"xxh64-xor:{(row['__vhash'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}:{n}"
    return out, vhash


def _scalar(v):
    """JSON-safe typed scalar rendering."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


def _profile_aggs(df: DataFrame, with_hash: bool = True):
    """Shared aggregate list for profile/hash computation."""
    aggs = []
    plan: list[tuple[str, bool]] = []
    for f in df.schema.fields:
        simple = isinstance(f.dataType, _STATS_TYPES)
        plan.append((f.name, simple))
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"))
        if simple:
            aggs.append(F.min(c).alias(f"{f.name}__min"))
            aggs.append(F.max(c).alias(f"{f.name}__max"))
    aggs.append(F.count(F.lit(1)).alias("__rows"))
    if with_hash:
        cols = sorted(df.columns)
        aggs.append(F.bit_xor(F.xxhash64(*[F.col(c) for c in cols])).alias("__vhash"))
    return aggs, plan


def _observe_profile(df: DataFrame):
    """Attach the profile/hash aggregates as an Observation so they are
    computed DURING the next action (e.g. the segment write) — zero
    extra passes. Returns (observed_df, observation)."""
    from pyspark.sql import Observation

    aggs, _ = _profile_aggs(df, with_hash=True)
    obs = Observation()
    return df.observe(obs, *aggs), obs


def _observe_count(df: DataFrame):
    from pyspark.sql import Observation

    obs = Observation()
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def _parse_observation(df: DataFrame, row: dict) -> tuple[dict[str, dict], str]:
    """Turn observed metrics back into (stats, value_hash)."""
    _, plan = _profile_aggs(df, with_hash=False)
    out: dict[str, dict] = {}
    for name, simple in plan:
        entry: dict = {"null_count": int(row[f"{name}__nulls"] or 0), "complete": simple}
        if simple:
            entry["min"] = _scalar(row[f"{name}__min"])
            entry["max"] = _scalar(row[f"{name}__max"])
        out[name] = entry
    n = int(row["__rows"])
    out["__table"] = {"rows": n}
    vhash = f"xxh64-xor:{(row['__vhash'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}:{n}"
    return out, vhash


def prune_segments(segments: list[dict], column: str, op: str, value) -> list[dict]:
    """Zone-map pruning over segment manifests: keep segments whose
    [min,max] may satisfy `column op value` (reference outcomes
    Pruned / RetainedMayMatch, `statistics_pruning.rs:17-60`).
    Conservative: segments lacking stats for the column are retained.
    """
    out = []
    for seg in segments:
        st = seg.get("stats", {}).get(column)
        if not st or not st.get("complete") or st.get("min") is None:
            out.append(seg)  # RetainedConservatively
            continue
        lo, hi = st["min"], st["max"]
        keep = {
            "eq": lambda: lo <= value <= hi,
            "ne": lambda: True,
            "lt": lambda: lo < value,
            "le": lambda: lo <= value,
            "gt": lambda: hi > value,
            "ge": lambda: hi >= value,
        }.get(op, lambda: True)()
        if keep:
            out.append(seg)
    return out
