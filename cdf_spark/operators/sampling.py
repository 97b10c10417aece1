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

from pyspark.sql import DataFrame, Window
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


def systematic_resample(
    df: DataFrame,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic systematic resampling: draw ``n`` items WITH
    replacement, each with probability proportional to its integer
    weight — the statistically standard low-variance resampler
    (particle filters; importance-weighted corpus mixing is the same
    math). Where `dsir_select`'s top-k KEEPS the k heaviest docs,
    this reproduces the full weight DISTRIBUTION: a doc with 2% of
    the total weight gets ~2% of the draws, heavy docs get multiple
    copies (`n_copies`), light docs drop out deterministically.

    Draw positions are the systematic grid p_i = (i*W) DIV n for
    i in [0, n) over total weight W; a doc owning cumulative weight
    span [lo, hi) receives

        n_copies = ceil(hi*n/W) - ceil(lo*n/W)

    (exact integers — ceil(a/b) = (a+b-1) DIV b; floor-div monotony
    makes the count formula closed-form, so no per-draw work exists
    anywhere). Items are laid on the weight line in md5(id) order —
    deterministic, uncorrelated with ingest order, and exactly
    reproducible in SQL.

    Scale posture: the cumulative weight line uses the suite's
    two-phase exact-cumsum discipline (range-repartition on the md5
    key so partitions tile the global order; per-partition offsets
    are the only driver state, O(partitions) rows) — no
    single-reducer global window. The closed-form count then needs
    no join against draws: output cost is O(rows), independent of n.

    Output: (id_col, weight, n_copies) for items with n_copies >= 1.
    """
    if n < 1:
        raise ValueError("n must be positive")
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(weight_col).cast("long").alias("_w")
    ).filter(F.col("_w") > 0)
    keyed = keyed.withColumn("_mk", F.md5(F.col("_id").cast("string")))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    keyed = (
        keyed.repartitionByRange(n_parts, F.col("_mk"), F.col("_id"))
        .withColumn("_pid", F.spark_partition_id())
        # pin the range partitioning across the offsets action and the
        # output action (the r13 two-phase determinism rule)
        .localCheckpoint(eager=True)
    )
    subtotals = (
        keyed.groupBy("_pid").agg(F.sum("_w").alias("_t")).collect()
    )
    acc, offsets = 0, []
    for r in sorted(subtotals, key=lambda r: r._pid):
        offsets.append((int(r._pid), acc))
        acc += int(r._t)
    total = acc
    if total <= 0:
        raise ValueError("total weight must be positive")
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy("_mk", "_id")
    spans = (
        keyed.join(F.broadcast(off_df), on="_pid")
        .withColumn("_hi", F.col("_off") + F.sum("_w").over(w))
        .withColumn("_lo", F.col("_hi") - F.col("_w"))
    )
    copies = (
        F.expr(f"(_hi * {n} + {total} - 1) div {total}")
        - F.expr(f"(_lo * {n} + {total} - 1) div {total}")
    ).cast("long")
    return (
        spans.withColumn("n_copies", copies)
        .filter(F.col("n_copies") >= 1)
        .select(F.col("_id").alias(id_col), F.col("_w").alias("weight"), "n_copies")
    )


def weighted_sample_no_replacement(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, A-ES): every item draws the key
    u^(1/w) — equivalently ranks by ln(u)/w — and the k largest keys
    are the sample; inclusion probability is proportional to weight,
    no item twice. `systematic_resample` reproduces the weight
    distribution WITH replacement (copies); this picks k DISTINCT
    items — the curation shape for "take 10k docs, quality-weighted,
    no duplicates".

    The uniform u is the suite's engine-portable hash randomness:
    u = (first-48-md5-bits + 1) / (2^48 + 1), in (0, 1) and an exact
    IEEE double on both engines, so the ranking key ln(u)/w replays
    in SQL bit-for-bit (one fixed-order expression; ln is the proven
    micro-nat primitive).

    Scale posture: the cut is orderBy(key desc) + limit(k) —
    TakeOrderedAndProject, a per-partition top-k merge, never a
    global sort materialization; the rank column windows only the k
    survivors (the pagerank_topk rule).

    Output: (id_col, weight, rank) — rank 1 = largest key.
    """
    if k < 1:
        raise ValueError("k must be positive")
    keyed = df.select(
        F.col(id_col).alias("_id"), F.col(weight_col).cast("long").alias("_w")
    ).filter(F.col("_w") > 0)
    # Weights are INTEGER masses (scale fractional scores to micro
    # units first — the suite-wide rule). The long cast truncates, so
    # a sub-1.0 weight column would silently empty the sample; refuse
    # instead (the systematic_resample zero-total rule).
    if keyed.isEmpty():
        raise ValueError(
            "no rows carry a positive integer weight — fractional "
            "weights truncate; scale them to micro-units first"
        )
    u = (
        F.conv(F.substring(F.md5(F.col("_id").cast("string")), 1, 12), 16, 10).cast(
            "long"
        )
        + F.lit(1)
    ).cast("double") / F.lit(float((1 << 48) + 1))
    keyed = keyed.withColumn("_key", F.log(u) / F.col("_w").cast("double"))
    top = keyed.orderBy(F.col("_key").desc(), F.col("_id").asc()).limit(k)
    w = Window.orderBy(F.col("_key").desc(), F.col("_id").asc())
    return top.select(
        F.col("_id").alias(id_col),
        F.col("_w").alias("weight"),
        F.row_number().over(w).alias("rank"),
    )
