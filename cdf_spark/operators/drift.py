"""Distribution-drift monitoring: population stability index (PSI)
between a reference snapshot and a current snapshot of the same
column — the production alarm a curation pipeline runs between
ingestion batches, model-training corpus versions, or destination
table versions ("did the upstream silently change shape").

PSI = sum over bins of (p_cur - p_ref) * ln(p_cur / p_ref); the
conventional reading is <0.1 stable, 0.1-0.25 drifting, >0.25 shifted
(Siddiqi, "Credit Risk Scorecards"). Counts are Laplace add-1 smoothed
(p = (c + 1) / (N + K) over K bins) so empty bins contribute finite
mass — deterministic and engine-portable, unlike an epsilon clamp of
floating proportions.

Determinism discipline (the house rule): bin assignment is pure
integer/fixed-order-double arithmetic; per-bin counts are exact
integers; the per-bin PSI term is ONE double expression over those
integers with operand order mirrored by the SQL oracle, micro-nat
rounded at the leaf — so the total PSI is an exact integer sum.

Scale posture: one map-side-combinable count aggregation per side
(the two sides never join row-wise — only their O(bins) count tables
meet), one 1-row bounds collect for numeric binning. O(bins) output
at any corpus size.

Reference frame: the reference profiles per-package column statistics
(`crates/cdf-kernel/src/statistics.rs`); PSI generalizes "what are
the stats" to "how far did they move", the monitoring direction its
freshness/reconciliation rules point at.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

MICRO = 1_000_000


def _ref_quantile_edges(ref: DataFrame, col: str, bins: int) -> list[float]:
    """Exact decile-style edges: the reference values at ranks
    ceil(i*N/bins), i in 1..bins-1 — order statistics, not
    interpolation, so both engines agree bit-for-bit. Global ranks
    come from the suite's two-phase pattern (range-repartition +
    O(partitions) driver offsets + local row_number), never a
    single-partition window; the collected state is the bins-1 edges
    themselves."""
    from pyspark.sql import Window

    spark = ref.sparkSession
    x = F.col(col).cast("double")
    vals = ref.filter(x.isNotNull() & ~F.isnan(x)).select(x.alias("_v"))
    n_parts = spark.sparkContext.defaultParallelism
    # eager checkpoint PINS the range partitioning: the offsets job and
    # the edge job below are separate actions, and re-executing the
    # exchange must not be allowed to re-derive its bounds (belt and
    # braces — it also stops the reference scan running twice)
    keyed = (
        vals.repartitionByRange(n_parts, F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotals = keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    acc, offsets = 0, []
    for r in sorted(subtotals, key=lambda r: r._pid):
        offsets.append((int(r._pid), acc))
        acc += int(r._n)
    n = acc
    if n == 0:
        raise ValueError("reference snapshot has no binnable values")
    ranks = sorted({-(-i * n // bins) for i in range(1, bins)})  # ceil(i*n/bins)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy("_v")
    edges = (
        keyed.join(F.broadcast(off_df), on="_pid")
        .withColumn("_rk", F.col("_off") + F.row_number().over(w))
        .filter(F.col("_rk").isin(ranks))
        .orderBy("_rk")
        .select("_v")
        .collect()
    )
    return [float(r["_v"]) for r in edges]


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int | None = None,
    method: str = "width",
) -> DataFrame:
    """Per-bin PSI between ``ref`` and ``cur`` on ``col``.

    ``bins=None`` treats the column as CATEGORICAL: bins are the
    distinct values observed on either side (plus each side's add-1
    smoothing over that union). An integer ``bins`` treats it as
    NUMERIC, under two binning methods:
    - ``method="width"`` (default): equal-width bins over the
      REFERENCE's [min, max] (the reference defines the expected
      range), out-of-range current values clamped into the edge bins,
      bin assignment in fixed-order double arithmetic.
    - ``method="quantile"``: equal-POPULATION bins — the textbook PSI
      form — anchored at the reference's exact rank-statistic edges
      (value at rank ceil(i*N/bins)); bin(x) = number of edges <= x,
      pure comparisons against collected edge literals, identical on
      both engines. Duplicate edges on skewed data merge bins
      naturally (empty bins stay finite under the add-1 smoothing).

    Returns one row per bin: (bin, ref_n, cur_n, psi_unat) with
    psi_unat the micro-nat PSI term; total PSI is their exact integer
    sum. NULLs are a bin of their own under categorical mode and are
    excluded under numeric mode (they are a missing-RATE drift, not a
    value drift — profile them separately).
    """
    if bins is not None and bins < 2:
        raise ValueError("numeric PSI needs at least 2 bins")
    if method not in ("width", "quantile"):
        raise ValueError(f"unknown binning method {method!r} (width | quantile)")
    if bins is None:
        r = ref.select(F.col(col).cast("string").alias("bin"))
        c = cur.select(F.col(col).cast("string").alias("bin"))
    else:
        # NaN discipline: Spark's MIN/MAX order NaN largest and an ANSI
        # cast of NaN to long throws mid-binning — exclude NaN rows up
        # front (like NULLs, they are a missing-rate drift, not a value
        # drift)
        _clean = F.col(col).cast("double")
        ref = ref.filter(_clean.isNotNull() & ~F.isnan(_clean))
        cur = cur.filter(_clean.isNotNull() & ~F.isnan(_clean))
        if method == "quantile":
            edges = _ref_quantile_edges(ref, col, bins)

            def _bin(df: DataFrame) -> DataFrame:
                x = F.col(col).cast("double")
                b = None
                for e in edges:
                    term = F.when(x >= F.lit(float(e)), F.lit(1)).otherwise(F.lit(0))
                    b = term if b is None else (b + term)
                return df.select(b.cast("long").cast("string").alias("bin"))

        else:
            lo, hi = ref.agg(
                F.min(F.col(col).cast("double")), F.max(F.col(col).cast("double"))
            ).collect()[0]
            if lo is None or not (hi > lo):
                raise ValueError(
                    f"reference column {col!r} has no spread to bin (min={lo}, max={hi})"
                )
            span = float(hi) - float(lo)

            def _bin(df: DataFrame) -> DataFrame:
                x = F.col(col).cast("double")
                b = F.floor((x - F.lit(float(lo))) * F.lit(float(bins)) / F.lit(span))
                return df.select(
                    F.least(
                        F.greatest(b.cast("long"), F.lit(0)), F.lit(bins - 1)
                    ).cast("string").alias("bin")
                )

        r, c = _bin(ref), _bin(cur)

    rc = r.groupBy("bin").agg(F.count(F.lit(1)).alias("ref_n")).alias("_dl")
    cc = c.groupBy("bin").agg(F.count(F.lit(1)).alias("cur_n")).alias("_dr")
    # null-safe bin merge: NULL is a real categorical bin (the
    # documented contract) and plain equality would split it into two
    # phantom half-rows, inflating K and the PSI terms.
    # K and the two totals RIDE the pin job as observed metrics (r14,
    # the §9.3 observe-on-checkpoint pattern) — the separate agg was
    # one more job over the just-pinned table.
    obs = Observation()
    both = (
        rc.join(cc, on=F.col("_dl.bin").eqNullSafe(F.col("_dr.bin")), how="full_outer")
        .select(
            F.coalesce(F.col("_dl.bin"), F.col("_dr.bin")).alias("bin"),
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
        )
        .observe(
            obs,
            F.count(F.lit(1)).alias("k"),
            F.sum("ref_n").alias("rt"),
            F.sum("cur_n").alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    _row = obs.get
    k_bins, ref_total, cur_total = _row["k"], _row["rt"], _row["ct"]
    if not ref_total or not cur_total:
        raise ValueError("both snapshots must be non-empty")
    nr, nc, kb = int(ref_total) + int(k_bins), int(cur_total) + int(k_bins), int(k_bins)
    # (pc - pr) * ln(pc / pr) with p = (n + 1)/(N + K); each ratio
    # factor is cast to double BEFORE the multiply (r14 — the integer
    # product (cur_n+1)*(N+K) wraps past 2^63 at ~1e10-per-bin counts;
    # double factors never overflow, and below 2^53 the product is
    # bit-identical to the exact-integer form). Operand order mirrors
    # the oracle token for token so IEEE parity holds at any scale.
    pc = (F.col("cur_n") + F.lit(1)).cast("double") / F.lit(float(nc))
    pr = (F.col("ref_n") + F.lit(1)).cast("double") / F.lit(float(nr))
    ratio = ((F.col("cur_n") + F.lit(1)).cast("double") * F.lit(float(nr))) / (
        (F.col("ref_n") + F.lit(1)).cast("double") * F.lit(float(nc))
    )
    return both.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((pc - pr) * F.log(ratio) * F.lit(1000000.0)).cast("long").alias(
            "psi_unat"
        ),
    )


def psi_drift_by(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    by: str,
    bins: int = 10,
) -> DataFrame:
    """Per-stratum PSI: one equal-width PSI per value of ``by``
    (language / domain / source) in a single pass — the shape a
    production monitor actually runs, because aggregate PSI washes out
    a drift confined to one slice.

    Semantics per stratum mirror ``psi_drift(method='width')``: the
    REFERENCE defines each stratum's universe and [min, max]; bins are
    equal-width over that range with edge clamping; Laplace add-1
    smoothing over each stratum's own observed-bin count K_s; each
    per-(stratum, bin) term is one fixed-order double over exact
    integer counts, micro-nat rounded — total PSI per stratum is an
    exact integer sum of its rows. Strata absent from the reference,
    with a NULL stratum key, or with no spread (min == max after the
    NULL/NaN value filter) are EXCLUDED — there is no expected range
    to drift from; monitor them by presence/rate instead.

    Scale posture: the per-stratum bounds are ONE tiny aggregation
    (O(strata) rows) broadcast back into the bin assignment — the two
    snapshots still never join row-wise and each side still reduces
    map-side to O(strata x bins) counts; the smoothing totals are a
    third tiny aggregation over the merged count table, broadcast
    back. No collect grows with the corpus (the single-PSI 1-row
    bounds collect becomes a broadcast join, strictly more
    distributed).

    Output: (stratum, bin, ref_n, cur_n, psi_unat).
    """
    if bins < 2:
        raise ValueError("numeric PSI needs at least 2 bins")
    x = F.col(col).cast("double")
    s = F.col(by).alias("stratum")
    refv = ref.filter(
        x.isNotNull() & ~F.isnan(x) & F.col(by).isNotNull()
    ).select(s, x.alias("_v"))
    curv = cur.filter(
        x.isNotNull() & ~F.isnan(x) & F.col(by).isNotNull()
    ).select(s, x.alias("_v"))
    # O(strata) rows; eager checkpoint so the reference isn't
    # re-scanned inside each side's broadcast build (the single-PSI
    # bounds collect, kept distributed)
    bounds = (
        refv.groupBy("stratum")
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
        .filter(F.col("_hi") > F.col("_lo"))
        .localCheckpoint(eager=True)
    )

    def _binned(df: DataFrame) -> DataFrame:
        # inner join: the reference's strata define the universe
        b = F.floor(
            (F.col("_v") - F.col("_lo")) * F.lit(float(bins)) / (F.col("_hi") - F.col("_lo"))
        )
        return (
            df.join(F.broadcast(bounds), on="stratum")
            .select(
                "stratum",
                F.least(F.greatest(b.cast("long"), F.lit(0)), F.lit(bins - 1))
                .cast("string")
                .alias("bin"),
            )
            .groupBy("stratum", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rc = _binned(refv).withColumnRenamed("n", "ref_n").alias("_dl")
    cc = _binned(curv).withColumnRenamed("n", "cur_n").alias("_dr")
    both = rc.join(
        cc,
        on=(F.col("_dl.stratum") == F.col("_dr.stratum"))
        & (F.col("_dl.bin") == F.col("_dr.bin")),
        how="full_outer",
    ).select(
        F.coalesce(F.col("_dl.stratum"), F.col("_dr.stratum")).alias("stratum"),
        F.coalesce(F.col("_dl.bin"), F.col("_dr.bin")).alias("bin"),
        F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
        F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
    ).localCheckpoint(eager=True)  # O(strata x bins); feeds totals + terms
    # bounds fed both binned sides, now folded into `both` — release
    # its blocks (the result below never re-reads it)
    from ..plans.checkpoint import release_local_checkpoint

    release_local_checkpoint(bounds)
    totals = both.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("_kb"),
        F.sum("ref_n").alias("_rt"),
        F.sum("cur_n").alias("_ct"),
    )
    j = both.join(F.broadcast(totals), on="stratum")
    nr = F.col("_rt") + F.col("_kb")
    nc = F.col("_ct") + F.col("_kb")
    # double factors before the multiply — same overflow rationale and
    # oracle mirroring as psi_drift above
    pc = (F.col("cur_n") + F.lit(1)).cast("double") / nc.cast("double")
    pr = (F.col("ref_n") + F.lit(1)).cast("double") / nr.cast("double")
    ratio = ((F.col("cur_n") + F.lit(1)).cast("double") * nr.cast("double")) / (
        (F.col("ref_n") + F.lit(1)).cast("double") * nc.cast("double")
    )
    return j.select(
        "stratum",
        "bin",
        "ref_n",
        "cur_n",
        F.round((pc - pr) * F.log(ratio) * F.lit(1000000.0)).cast("long").alias(
            "psi_unat"
        ),
    )
