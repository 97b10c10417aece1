"""Temporal joins and rollups: range (point-in-interval) join and
hypertable-style continuous-aggregate rollups.

Named in the build brief alongside as-of join (`operators/asof.py`) as
operators Spark lacks natively; both are expressed as compositions of
DataFrame ops so Catalyst keeps planning them.

- `range_join`: the naive formulation is a theta-join
  (`start <= ts AND ts < end`) which Spark can only execute as a
  BroadcastNestedLoopJoin (O(|points| x |intervals|) comparisons) or a
  cartesian product. The scale path converts it to an EQUI-join by
  time-bucketing: each interval is exploded to the fixed-width buckets
  it overlaps, each point maps to its single containing bucket, the
  join is hash-based on the bucket, and the exact containment predicate
  runs as a residual filter. Each (point, interval) match appears in
  exactly ONE bucket (the point's), so no dedup pass is needed. Cost:
  |intervals| x ceil(span/width) exploded rows (choose width near the
  median interval span) and one shuffle-or-broadcast hash join — the
  standard interval-join decomposition at 100 TB.

- `hypertable_rollup`: a fine-grained time-bucket aggregate plus a
  coarse aggregate computed FROM the fine one (never from raw) — the
  continuous-aggregate discipline: the fine rollup is the stored
  materialization, coarser views re-aggregate it. Sums ride
  DECIMAL(38,6) so re-aggregation is exact and order-independent,
  which is what lets the oracle verify coarse-from-fine equals
  coarse-from-raw bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import pin_if_expensive, pinned_scalars


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86_400,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (`start <= ts < end`), as a bucketed equi-join + residual filter.
    Output: all point columns + all interval columns.

    ``broadcast_intervals`` fits the common shape (dimension-sized
    interval sets — campaigns, validity windows); set False to
    shuffle-hash-join two huge sides on the bucket key."""
    # exact microseconds everywhere (unix_micros), integer `div`:
    # CAST(ts AS LONG) would truncate fractional seconds, and an
    # interval whose end carries a sub-second component would then
    # never explode into its final bucket — points in that last
    # partial bucket would be lost by the equi-join with no residual
    # to recover them. Double division is no better: rounding at
    # bucket boundaries is only accidentally correct.
    w_us = bucket_seconds * 1_000_000
    start_b = F.expr(f"unix_micros({start_col}) div {w_us}")
    # end is exclusive: the last overlapped bucket is the one holding
    # end - 1 microsecond (an interval ending exactly on a boundary
    # does not reach into the next bucket)
    end_b = F.expr(f"(unix_micros({end_col}) - 1) div {w_us}")
    iv = intervals.withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn("_bucket", F.expr(f"unix_micros({ts_col}) div {w_us}"))
    return (
        pt.join(iv, on="_bucket")
        .filter((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    coarse: str = "day",
    key_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(fine_rollup, coarse_rollup) where coarse is computed FROM fine.

    fine_rollup:   (bucket, [key], sum_value DECIMAL-exact, n_rows)
    coarse_rollup: (bucket, [key], sum_value, n_rows) — re-aggregated,
    provably equal to aggregating raw data at the coarse grain (the
    continuous-aggregate law; the oracle query asserts it value-level).
    """
    keys = [key_col] if key_col else []
    dec = F.col(value_col).cast("decimal(38,6)")
    fine_df = (
        df.groupBy(F.date_trunc(fine, F.col(ts_col)).alias("bucket"), *keys)
        .agg(F.sum(dec).alias("sum_value"), F.count(F.lit(1)).alias("n_rows"))
    )
    coarse_df = (
        fine_df.groupBy(F.date_trunc(coarse, F.col("bucket")).alias("bucket"), *keys)
        .agg(F.sum("sum_value").alias("sum_value"), F.sum("n_rows").alias("n_rows"))
    )
    return fine_df, coarse_df


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within: str = "7 days",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel (ClickHouse ``windowFunnel`` semantics,
    strict-order/first-occurrence variant): for each user, step 1
    anchors at the user's FIRST step-1 event; step i completes at the
    first step-i event STRICTLY after step i-1's completion and within
    ``within`` of the anchor. Returns one row per step:
    (step_idx, step, n_users) — exact integer counts, so the whole
    funnel replays in SQL.

    Scale posture: one user-keyed min-aggregation per step (map-side
    combinable) and one user-keyed equi-join per step transition — all
    shuffles share the user key, so AQE plans one exchange layout and
    per-user state is O(steps), never a per-user event sort. The
    events scan is filtered to the step types before any shuffle.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    # Each step table feeds TWO consumers (the next step's join and
    # its own count leg), and the count legs re-derived the whole
    # nested chain — the AQE-final plan scanned `events` 1+2+…+steps
    # times (measured r14: 6 scans for the 3-step bench funnel). The
    # iterative-loop checkpoint discipline (BPE/PageRank/MMR) pins the
    # filtered event cut once and each O(users)-row step table once:
    # one events scan total, and every count leg is an agg over a pin.
    # SIZE-GATED (r15): each eager pin is a synchronous job with a
    # fixed driver/barrier cost; below the gate the repeated scans are
    # cheaper than 1+steps pin jobs (the r14 driver record: 0.48x at
    # sf0.1), so small inputs keep the lazy single-job plan.
    ev = pin_if_expensive(
        events.select(
            F.col(user_col).alias("_u"), F.col(type_col).alias("_t"), F.col(ts_col).alias("_ts")
        ).filter(F.col(type_col).isin(steps)),
        source=events,
    )

    anchors = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_c1"))
        .select("_u", "_c1", (F.col("_c1") + F.expr(f"INTERVAL {within}")).alias("_hz"))
    )
    reached = [
        pin_if_expensive(
            anchors.select("_u", F.col("_c1").alias("_c"), "_hz"), source=events
        )
    ]
    for step in steps[1:]:
        prev = reached[-1]
        nxt = (
            ev.filter(F.col("_t") == step)
            .join(prev, on="_u")
            .filter((F.col("_ts") > F.col("_c")) & (F.col("_ts") <= F.col("_hz")))
            .groupBy("_u", "_hz")
            .agg(F.min("_ts").alias("_c"))
            .select("_u", "_c", "_hz")
        )
        reached.append(pin_if_expensive(nxt, source=events))

    spark = events.sparkSession
    labels = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], ["step_idx", "step"]
    )
    counts = None
    for i, df in enumerate(reached):
        c = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).alias("step_idx"), "n_users"
        )
        counts = c if counts is None else counts.unionAll(c)
    return labels.join(counts, on="step_idx").select(
        "step_idx", "step", F.col("n_users").cast("long").alias("n_users")
    )


def cohort_retention(
    events: DataFrame,
    max_offset: int = 8,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday-based
    week of their FIRST event; for each cohort and week offset 0..
    ``max_offset``, counts the users active (any event) in that week.
    The standard product-analytics retention triangle, and the
    data-freshness view a streaming-corpus operator reads the same
    way (contributors cohorted by first-ingest week).

    Output: (cohort_week DATE, week_offset INT, n_users BIGINT) —
    exact integer counts over exact date arithmetic, so the whole
    triangle replays in SQL.

    Scale posture: one user-keyed min-agg for cohorts, one
    (user, week) DISTINCT for activity — both map-side combinable —
    and one user-keyed join; the output is |cohorts| x |offsets|
    rows. No per-user event buffering, no skew amplification (a hot
    user reduces to one row per active week before the join).
    """
    if max_offset < 0:
        raise ValueError("max_offset must be non-negative")
    ev = events.select(
        F.col(user_col).alias("_u"), F.date_trunc("week", F.col(ts_col)).cast("date").alias("_w")
    )
    # cohorts fold from the DISTINCT activity table, not from raw
    # events (r14, guide §1.2): min(_w) over distinct (user, week)
    # equals min over all events exactly, so deriving cohorts from the
    # pinned `active` cut halves the events scans (the AQE-final plan
    # read events once per consumer) and the cohort agg now reduces
    # O(users × active weeks) rows instead of O(events).
    # SIZE-GATED (r15): below the gate the second scan is cheaper than
    # the synchronous pin job (r14 driver record: 0.57x at sf0.1).
    active = pin_if_expensive(ev.distinct(), source=events)
    cohorts = active.groupBy("_u").agg(F.min("_w").alias("_cw"))
    return (
        active.join(cohorts, on="_u")
        .select(
            "_u",
            "_cw",
            (F.datediff(F.col("_w"), F.col("_cw")) / 7).cast("int").alias("week_offset"),
        )
        .filter(F.col("week_offset") <= max_offset)
        .distinct()
        .groupBy(F.col("_cw").alias("cohort_week"), "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def daily_count_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Three-sigma anomaly flags on per-(type, day) event counts,
    computed in EXACT integer arithmetic: with per-type day count n,
    count sum S and square-sum Q, a day with count c is anomalous iff

        (c*n - S)^2 > 9 * (n*Q - S^2)

    — the cross-multiplied form of |c - mean| > 3*stddev (population
    sigma), which needs no division, no sqrt, and no floats, so the
    flag is bit-identical across engines and partitionings. The
    ops-monitoring twin of the curation layer's quality gates
    (spike/outage detection over an ingest stream's own counts).

    Output: (event_type, day, c, n_days, dev_sq, thresh, is_anomaly)
    for every (type, day) — `dev_sq`/`thresh` expose the decision
    margin. Int64 bound: |c*n_days - S| must stay under ~3e9 for the
    square to fit (daily counts x series length < 3e9 — beyond that,
    pre-bucket counts to thousands before flagging). Two map-side-combinable aggregations (day counts, then
    per-type moments joined back); the per-type moment table is
    |types| rows — broadcast-scale.
    """
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("day", F.col(ts_col)).cast("date").cast("string").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("_s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_q"),
    )
    dev = F.col("c") * F.col("n_days") - F.col("_s")
    dev_sq = (dev * dev).cast("long")
    thresh = (
        F.lit(9) * (F.col("n_days") * F.col("_q") - F.col("_s") * F.col("_s"))
    ).cast("long")
    return (
        daily.join(F.broadcast(moments), on="event_type")
        .select(
            "event_type",
            "day",
            "c",
            "n_days",
            dev_sq.alias("dev_sq"),
            thresh.alias("thresh"),
            (dev_sq > thresh).alias("is_anomaly"),
        )
    )


def funnel_conversion_stats(
    events: DataFrame,
    steps: list[str],
    within: str = "7 days",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert statistics for users who complete the WHOLE
    funnel (same strict-order/first-occurrence/anchored-horizon
    semantics as `funnel_counts`): one row with the converted-user
    count and the exact lower-median and ceiling-p90 of
    (last-step time - anchor time) in integer milliseconds.

    Percentiles are ORDER STATISTICS (element at rank
    (n+1) DIV 2 / ceil(9n/10)) — no interpolation, no floats, so the
    values replay exactly in SQL. The ranking window runs over the
    converted-user set only (bounded by the user count, stated), and
    conversion times are exact integer millisecond differences.

    Output: (n_converted, median_ms, p90_ms).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    # the filtered event cut feeds the anchor build AND every step
    # join — pin it once or events is scanned per consumer (r14, the
    # funnel_counts discipline; was 3 scans for the 3-step funnel).
    # SIZE-GATED (r15): small inputs keep the lazy plan (see
    # funnel_counts).
    ev = pin_if_expensive(
        events.select(
            F.col(user_col).alias("_u"), F.col(type_col).alias("_t"), F.col(ts_col).alias("_ts")
        ).filter(F.col(type_col).isin(steps)),
        source=events,
    )
    anchors = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_a"))
        .select("_u", "_a", F.col("_a").alias("_c"), (F.col("_a") + F.expr(f"INTERVAL {within}")).alias("_hz"))
    )
    reach = anchors
    for step in steps[1:]:
        reach = (
            ev.filter(F.col("_t") == step)
            .join(reach, on="_u")
            .filter((F.col("_ts") > F.col("_c")) & (F.col("_ts") <= F.col("_hz")))
            .groupBy("_u", "_a", "_hz")
            .agg(F.min("_ts").alias("_c"))
            .select("_u", "_a", "_c", "_hz")
        )
    conv = reach.select(
        "_u",
        (
            F.unix_millis(F.col("_c").cast("timestamp"))
            - F.unix_millis(F.col("_a").cast("timestamp"))
        ).alias("_ms"),
    )
    from pyspark.sql.window import Window

    # ranked is consumed THREE times (the count plus the median and
    # p90 branches) — left lazy, each consumer re-ran the whole
    # step-join chain (r14: 6 scans in the final plan + 3 in the count
    # job). The pin is O(converted users) rows of three longs; the
    # count RIDES the pin job itself as an observed metric (r14, the
    # §9.3 observe-on-checkpoint pattern), zero extra jobs. SIZE-GATED
    # (r15): below the gate the count is one bounded agg job and the
    # median/p90 branches re-derive the (cheap at that scale) chain.
    w = Window.orderBy(F.col("_ms").asc(), F.col("_u").asc())
    ranked, _stats = pinned_scalars(
        conv.withColumn("_rn", F.row_number().over(w)),
        [F.count(F.lit(1)).alias("n")],
        source=events,
    )
    n = int(_stats["n"])
    if n == 0:
        return events.sparkSession.createDataFrame(
            [(0, None, None)], "n_converted long, median_ms long, p90_ms long"
        )
    med_rk, p90_rk = (n + 1) // 2, (9 * n + 9) // 10
    med = ranked.filter(F.col("_rn") == med_rk).select(F.col("_ms"))
    p90 = ranked.filter(F.col("_rn") == p90_rk).select(F.col("_ms"))
    return (
        med.crossJoin(p90.withColumnRenamed("_ms", "_ms90"))
        .select(
            F.lit(n).cast("long").alias("n_converted"),
            F.col("_ms").cast("long").alias("median_ms"),
            F.col("_ms90").cast("long").alias("p90_ms"),
        )
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    within_seconds: int = 86400,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the user's most recent touch event at-or-before it
    (as-of semantics) within ``within_seconds``; conversions with no
    in-window touch land in the 'none' bucket. The classic marketing
    attribution shape, built on the suite's `asof_join` (union +
    per-user last-observation window — one shuffle, no range
    self-join).

    Same-timestamp touches are deduplicated deterministically (the
    lexicographically greatest touch type wins per (user, ts)) so the
    as-of pick is total-order stable and SQL-replayable.

    Output: (touch_type, n_conversions) — exact integer counts.
    """
    from .asof import asof_join

    # plain TIMESTAMP for the as-of tolerance arithmetic (the session
    # pins UTC, so the NTZ->TZ cast is stable)
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"), F.col(ts_col).cast("timestamp").alias("_ts")
    )
    touches = (
        events.filter(F.col(type_col).isin(*touch_types))
        .groupBy(F.col(user_col).alias("_u"), F.col(ts_col).cast("timestamp").alias("_ts"))
        .agg(F.max(type_col).alias("touch"))
    )
    att = asof_join(
        conv, touches, on="_ts", by=["_u"], tolerance=within_seconds, direction="backward"
    )
    return (
        att.groupBy(F.coalesce(F.col("r_touch"), F.lit("none")).alias("touch_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"))
    )


def daily_trend_slopes(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type linear trend of daily event counts — closed-form
    least squares over exact integer sums ("is the error rate
    trending up" without a model server):

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    with x = day index (days since the type's first day — exact
    integers from date arithmetic) and y = daily count. All five
    sufficient statistics are map-side-combinable integer sums; the
    slope is ONE fixed-order double per type, micro-rounded — the
    closed-form cousin of the iterative fits (no iteration, no
    shuffle beyond the two count/moment aggregations).

    Output: (event_type, n_days, slope_micro) — slope in micro-counts
    per day; single-day types report NULL slope (denominator zero is
    undefined trend, not zero trend).
    """
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("_day"),
        )
        .groupBy("event_type", "_day")
        .agg(F.count(F.lit(1)).cast("long").alias("_y"))
    )
    based = daily.join(
        daily.groupBy("event_type").agg(F.min("_day").alias("_d0")), on="event_type"
    ).select(
        "event_type",
        F.datediff(F.col("_day"), F.col("_d0")).cast("long").alias("_x"),
        "_y",
    )
    stats = based.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = F.col("n_days") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_days") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return stats.select(
        "event_type",
        "n_days",
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double") * F.lit(1000000.0)).cast("long"),
        ).alias("slope_micro"),
    )
