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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int | None = None,
) -> DataFrame:
    """Per-bin PSI between ``ref`` and ``cur`` on ``col``.

    ``bins=None`` treats the column as CATEGORICAL: bins are the
    distinct values observed on either side (plus each side's add-1
    smoothing over that union). An integer ``bins`` treats it as
    NUMERIC: equal-width bins over the REFERENCE's [min, max] (the
    scorecard convention — the reference defines the expected range),
    with out-of-range current values clamped into the edge bins, plus
    bin assignment `least(greatest(floor((x - lo) * bins / span), 0),
    bins - 1)` in fixed-order double arithmetic.

    Returns one row per bin: (bin, ref_n, cur_n, psi_unat) with
    psi_unat the micro-nat PSI term; total PSI is their exact integer
    sum. NULLs are a bin of their own under categorical mode and are
    excluded under numeric mode (they are a missing-RATE drift, not a
    value drift — profile them separately).
    """
    if bins is not None and bins < 2:
        raise ValueError("numeric PSI needs at least 2 bins")
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
            return df.filter(x.isNotNull()).select(
                F.least(
                    F.greatest(b.cast("long"), F.lit(0)), F.lit(bins - 1)
                ).cast("string").alias("bin")
            )

        r, c = _bin(ref), _bin(cur)

    rc = r.groupBy("bin").agg(F.count(F.lit(1)).alias("ref_n")).alias("_dl")
    cc = c.groupBy("bin").agg(F.count(F.lit(1)).alias("cur_n")).alias("_dr")
    # null-safe bin merge: NULL is a real categorical bin (the
    # documented contract) and plain equality would split it into two
    # phantom half-rows, inflating K and the PSI terms
    both = (
        rc.join(cc, on=F.col("_dl.bin").eqNullSafe(F.col("_dr.bin")), how="full_outer")
        .select(
            F.coalesce(F.col("_dl.bin"), F.col("_dr.bin")).alias("bin"),
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
            F.coalesce(F.col("cur_n"), F.lit(0)).alias("cur_n"),
        )
        .localCheckpoint(eager=True)
    )
    k_bins, ref_total, cur_total = both.agg(
        F.count(F.lit(1)), F.sum("ref_n"), F.sum("cur_n")
    ).collect()[0]
    if not ref_total or not cur_total:
        raise ValueError("both snapshots must be non-empty")
    nr, nc, kb = int(ref_total) + int(k_bins), int(cur_total) + int(k_bins), int(k_bins)
    # (pc - pr) * ln(pc / pr) with p = (n + 1)/(N + K); the ratio is
    # exact-integer-over-exact-integer so the single ln and the single
    # subtraction keep IEEE parity with the oracle's identical text
    pc = (F.col("cur_n") + F.lit(1)).cast("double") / F.lit(float(nc))
    pr = (F.col("ref_n") + F.lit(1)).cast("double") / F.lit(float(nr))
    ratio = ((F.col("cur_n") + F.lit(1)) * F.lit(nr)).cast("double") / (
        (F.col("ref_n") + F.lit(1)) * F.lit(nc)
    ).cast("double")
    return both.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((pc - pr) * F.log(ratio) * F.lit(1000000.0)).cast("long").alias(
            "psi_unat"
        ),
    )
