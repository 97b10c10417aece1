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
