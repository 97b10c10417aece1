"""Deterministic stratified hash sampling.

Re-expresses the reference's `stratified-hash-v1` selector
(`crates/cdf-kernel/src/stratified_selection.rs:1-463`): preview /
inspection reads must be *deterministic* (same inputs -> same sample),
so selection is `hash(identity) mod k` rather than RNG-based
`df.sample`. Identity strength: a declared key if present, else the
whole row.

JVM-side xxhash64 keeps this in codegen; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_hash_sample(
    df: DataFrame,
    identity_cols: list[str] | None = None,
    modulus: int = 100,
    keep_buckets: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Keep rows whose identity-hash bucket < keep_buckets (of modulus).

    Deterministic across runs and partitionings; ~keep_buckets/modulus
    of rows survive, stratified across the identity space.
    """
    if not 0 < keep_buckets <= modulus:
        raise ValueError("keep_buckets must be in (0, modulus]")
    cols = [F.col(c) for c in (identity_cols or df.columns)]
    bucket = F.pmod(F.xxhash64(F.lit(seed), *cols), F.lit(modulus))
    return df.filter(bucket < keep_buckets)


def stratified_topk_sample(
    df: DataFrame,
    k: int,
    strata_cols: list[str],
    identity_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """EXACT-k deterministic sample per stratum: within each stratum,
    keep the k rows with the smallest md5(seed:identity) — a
    hash-rank reservoir with no RNG state, so the sample is
    bit-reproducible across runs, partitionings, AND engines (md5 is
    the cross-engine ordering the oracle recomputes).

    The rate-based `stratified_hash_sample` gives ~p·n rows per
    stratum — right for throughput sampling; this one gives exactly
    min(k, n) — right for eval-set carving and per-domain quotas,
    where "about 1000" is not a contract.

    Cost: one shuffle on the strata (window rank); the hash is
    codegen'd JVM-side. Skewed strata are one partition each — fine
    while k ≪ stratum size; a pathological single-stratum corpus
    degrades to a global top-k (AQE splits the sort, the rank is
    still one reducer per stratum — the inherent cost of exactness).
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    ident = [F.col(c).cast("string") for c in (identity_cols or df.columns)]
    rank_key = F.md5(F.concat_ws(":", F.lit(str(seed)), *ident))
    return (
        df.withColumn("_rk", rank_key)
        .withColumn("_rn", F.row_number().over(Window.partitionBy(*strata_cols).orderBy("_rk")))
        .filter(F.col("_rn") <= k)
        .drop("_rk", "_rn")
    )
