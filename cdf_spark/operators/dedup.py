"""Keyed deduplication with keep-first / keep-last / fail policies.

Re-expresses the reference's contract dedup
(`RowRule::Dedup`, `crates/cdf-contract/src/policy.rs:263-275`;
`DedupKeepProgram`, `crates/cdf-contract/src/program.rs:335-339`;
spill-backed external sort `crates/cdf-engine/src/dedup_spill.rs`) as a
window-rank: partition by keys, order by the declared package order,
keep row 1. Spark's shuffle/sort (Tungsten, spills to disk) replaces
the reference's hand-built external-sort machinery outright.

Scale notes: one shuffle on the dedup keys — unavoidable for exact
dedup; AQE's skew-join/partition-coalescing handles moderate key skew.
For a composite order column prefer monotone physical orders (cursor,
file position) so the sort inside each group is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class DuplicateKeyError(Exception):
    pass


def dedup_keyed(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    keep: str = "last",
    fail_action: str = "raise",  # raise | mark
) -> DataFrame:
    """Deduplicate on ``keys``.

    keep="first"/"last": winner per key under ``order_by`` (ascending;
    last = descending rank). Ties broken by the full order column list
    — supply a total order (e.g. cursor + file position) for
    deterministic replay, mirroring the reference's canonical package
    order (`CDF_PACKAGE_ROW_ORDINAL_SEMANTIC`).

    keep="fail": any duplicate key is an error (raise) or rows are
    marked with `_cdf_duplicate=true` (mark) for quarantine routing.
    """
    if keep not in ("first", "last", "fail"):
        raise ValueError(f"unknown keep policy {keep!r}")

    if keep == "fail":
        w = Window.partitionBy(*keys)
        marked = df.withColumn("_cdf_duplicate", F.count(F.lit(1)).over(w) > 1)
        if fail_action == "mark":
            return marked
        dupes = marked.filter("_cdf_duplicate").limit(1).collect()
        if dupes:
            raise DuplicateKeyError(f"duplicate keys {keys} present; first witness: {dupes[0]}")
        return df

    cols = [F.col(c) for c in order_by]
    ordering = cols if keep == "first" else [c.desc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("_cdf_rn", F.row_number().over(w))
        .filter(F.col("_cdf_rn") == 1)
        .drop("_cdf_rn")
    )
