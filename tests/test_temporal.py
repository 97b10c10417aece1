"""Range join + hypertable rollup (`cdf_spark/operators/temporal.py`):
exclusive-end boundaries, bucket-edge correctness, overlap fan-out, and
the continuous-aggregate re-aggregation law."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdf_spark.operators.temporal import hypertable_rollup, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start: included
            (2, _ts("2024-01-03 23:59:59")),  # inside
            (3, _ts("2024-01-04 00:00:00")),  # == end: EXCLUDED
            (4, _ts("2023-12-31 23:59:59")),  # before
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-04 00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    got = {r.pid for r in range_join(points, intervals, "ts", "s", "e").collect()}
    assert got == {1, 2}


def test_range_join_interval_ending_on_bucket_boundary(spark):
    """An interval ending exactly on a bucket boundary must NOT explode
    into the next bucket (end is exclusive) — yet a point in the last
    covered bucket must still match."""
    points = spark.createDataFrame(
        [(1, _ts("2024-01-02 12:00:00"))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"))],
        "iid long, s timestamp, e timestamp",
    )
    out = range_join(points, intervals, "ts", "s", "e").collect()
    assert [r.iid for r in out] == [7]


def test_range_join_overlap_fanout_exactly_once_per_pair(spark):
    """Overlapping intervals: a point matches each containing interval
    exactly once (each pair meets in exactly one bucket — no dedup
    pass exists to hide a double-count)."""
    points = spark.createDataFrame(
        [(1, _ts("2024-01-05 06:00:00"))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 00:00:00"), _ts("2024-01-06 00:00:00")),
            (1, _ts("2024-01-03 00:00:00"), _ts("2024-01-08 00:00:00")),
            (2, _ts("2024-01-05 00:00:00"), _ts("2024-01-10 00:00:00")),
            (3, _ts("2024-01-07 00:00:00"), _ts("2024-01-12 00:00:00")),
        ],
        "iid long, s timestamp, e timestamp",
    )
    rows = range_join(points, intervals, "ts", "s", "e").collect()
    assert sorted(r.iid for r in rows) == [0, 1, 2]  # each once, 3 excluded


def test_rollup_reaggregation_law(spark, sf_dir):
    """coarse-from-fine == coarse-from-raw, exactly (DECIMAL sums)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _fine, coarse = hypertable_rollup(ev, "ts", "value", fine="hour", coarse="day")
    direct = (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    a = {(r.bucket, str(r.sum_value), r.n_rows) for r in coarse.collect()}
    b = {(r.bucket, str(r.sum_value), r.n_rows) for r in direct.collect()}
    assert a == b and a


def test_range_join_fractional_second_interval_end(spark):
    """An interval whose end carries a sub-second component must still
    explode into its final partial bucket — whole-second truncation of
    the end timestamp silently dropped points there (regression)."""
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-03 00:00:00")),      # in the last PARTIAL bucket
            (2, _ts("2024-01-03 00:00:00.400")),  # inside, before the .5s end
            (3, _ts("2024-01-03 00:00:00.500")),  # == end: EXCLUDED
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00.500"))],
        "iid long, s timestamp, e timestamp",
    )
    got = {r.pid for r in range_join(points, intervals, "ts", "s", "e").collect()}
    assert got == {1, 2}


def test_funnel_strict_order_and_horizon(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import funnel_counts

    T = datetime
    rows = [
        # u1 completes all three in order within horizon
        (1, "view", T(2024, 1, 1)),
        (1, "click", T(2024, 1, 2)),
        (1, "purchase", T(2024, 1, 3)),
        # u2 clicks BEFORE viewing: click doesn't count; re-click after
        # view is missing -> stops at step 1
        (2, "click", T(2024, 1, 1)),
        (2, "view", T(2024, 1, 2)),
        (2, "purchase", T(2024, 1, 3)),  # purchase without valid click
        # u3 completes but outside the 7-day horizon
        (3, "view", T(2024, 1, 1)),
        (3, "click", T(2024, 1, 2)),
        (3, "purchase", T(2024, 1, 20)),
        # u4 never views
        (4, "click", T(2024, 1, 1)),
        (4, "purchase", T(2024, 1, 2)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click", "purchase"], within="7 days").collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_anchor_is_first_view_and_equal_ts_excluded(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import funnel_counts

    T = datetime
    rows = [
        # horizon anchors at the FIRST view (Jan 1), so the Jan 10
        # click is outside [anchor, anchor+7d] even though a later
        # view exists; same-timestamp click is NOT strictly after.
        (1, "view", T(2024, 1, 1)),
        (1, "view", T(2024, 1, 9)),
        (1, "click", T(2024, 1, 10)),
        (2, "view", T(2024, 1, 1)),
        (2, "click", T(2024, 1, 1)),  # equal ts: excluded (strict >)
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, ["view", "click"], within="7 days").collect()
    }
    assert got == {"view": 2, "click": 0}


def test_funnel_rejects_bad_steps(spark):
    import pytest

    from cdf_spark.operators.temporal import funnel_counts

    ev = spark.createDataFrame([(1, "view", None)], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        funnel_counts(ev, ["view"])
    with pytest.raises(ValueError):
        funnel_counts(ev, ["view", "view"])


def test_cohort_retention_multi_cohort_triangle(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import cohort_retention

    T = datetime
    rows = [
        # u1: cohort week of Jan 1 (Mon), active weeks 0 and 2
        (1, T(2024, 1, 3)), (1, T(2024, 1, 17)),
        # u2: same cohort, active week 0 only (two events, one week)
        (2, T(2024, 1, 2)), (2, T(2024, 1, 5)),
        # u3: cohort week of Jan 8, active weeks 0 and 1
        (3, T(2024, 1, 9)), (3, T(2024, 1, 16)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_cohort_retention_offset_cap(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import cohort_retention

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (1, datetime(2024, 6, 1))], ["user_id", "ts"]
    )
    got = cohort_retention(ev, max_offset=2).collect()
    assert {(r["week_offset"]) for r in got} == {0}  # June is past the cap


def test_daily_count_anomalies_flags_planted_spike(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import daily_count_anomalies

    rows = []
    # 10 quiet days with 5 events each, one day with 50
    for d in range(1, 11):
        rows += [("err", datetime(2024, 1, d, h)) for h in range(5)]
    rows += [("err", datetime(2024, 1, 11, h)) for h in range(5, 24)] + [
        ("err", datetime(2024, 1, 11, h, 30)) for h in range(0, 24)
    ]  # 43 events
    # a steady type never flags
    rows += [("ok", datetime(2024, 1, d)) for d in range(1, 12)]
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {
        (r["event_type"], r["day"]): r["is_anomaly"]
        for r in daily_count_anomalies(ev, type_col="event_type").collect()
    }
    assert got[("err", "2024-01-11")] is True
    assert not any(v for (t, d), v in got.items() if (t, d) != ("err", "2024-01-11"))


def test_daily_count_anomalies_integer_margin_columns(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import daily_count_anomalies

    ev = spark.createDataFrame(
        [("a", datetime(2024, 1, 1)), ("a", datetime(2024, 1, 2)),
         ("a", datetime(2024, 1, 2))],
        ["event_type", "ts"],
    )
    # n=2 days, counts 1 and 2: S=3, Q=5; dev for c=1: (2-3)^2=1;
    # thresh = 9*(2*5-9) = 9
    r = {row["day"]: row for row in daily_count_anomalies(ev).collect()}
    assert r["2024-01-01"]["dev_sq"] == 1 and r["2024-01-01"]["thresh"] == 9
    assert r["2024-01-01"]["is_anomaly"] is False


def test_funnel_conversion_stats_order_statistics(spark):
    from datetime import datetime, timedelta

    from cdf_spark.operators.temporal import funnel_conversion_stats

    rows = []
    base = datetime(2024, 1, 1)
    # users 1..5 convert in 10, 20, 30, 40, 50 minutes
    for u, mins in zip(range(1, 6), (10, 20, 30, 40, 50)):
        rows += [
            (u, "view", base),
            (u, "click", base + timedelta(minutes=mins // 2)),
            (u, "purchase", base + timedelta(minutes=mins)),
        ]
    rows.append((9, "view", base))  # never converts
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    (r,) = funnel_conversion_stats(ev, ["view", "click", "purchase"]).collect()
    # n=5: lower median = rank 3 (30 min), p90 = rank ceil(4.5)=5 (50)
    assert r["n_converted"] == 5
    assert r["median_ms"] == 30 * 60_000
    assert r["p90_ms"] == 50 * 60_000


def test_funnel_conversion_stats_empty(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import funnel_conversion_stats

    ev = spark.createDataFrame(
        [(1, "view", datetime(2024, 1, 1))], ["user_id", "event_type", "ts"]
    )
    (r,) = funnel_conversion_stats(ev, ["view", "click"]).collect()
    assert r["n_converted"] == 0 and r["median_ms"] is None


def test_last_touch_attribution_window_and_ties(spark):
    from datetime import datetime, timedelta

    from cdf_spark.operators.temporal import last_touch_attribution

    T = datetime(2024, 1, 10, 12)
    rows = [
        # u1: click 1h before purchase -> attributed to click
        (1, "view", T - timedelta(hours=5)),
        (1, "click", T - timedelta(hours=1)),
        (1, "purchase", T),
        # u2: only touch is 2 days before -> outside 24h -> none
        (2, "view", T - timedelta(days=2)),
        (2, "purchase", T),
        # u3: view and click at the SAME ts -> 'view' wins (max type)
        (3, "view", T - timedelta(hours=2)),
        (3, "click", T - timedelta(hours=2)),
        (3, "purchase", T),
        # u4: touch exactly AT the purchase ts counts (as-of <=)
        (4, "click", T),
        (4, "purchase", T),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["touch_type"]: r["n_conversions"] for r in last_touch_attribution(ev).collect()}
    assert got == {"click": 2, "none": 1, "view": 1}


def test_daily_trend_slopes_exact_fit_and_single_day_null(spark):
    from datetime import datetime

    from cdf_spark.operators.temporal import daily_trend_slopes

    rows = []
    # 'up': counts 1,2,3,4 on days 0..3 -> slope exactly 1.0/day
    for d in range(4):
        rows += [("up", datetime(2024, 1, 1 + d, h)) for h in range(d + 1)]
    # 'flat': 2 events/day for 3 days -> slope 0
    for d in range(3):
        rows += [("flat", datetime(2024, 1, 1 + d, h)) for h in range(2)]
    # 'once': a single day -> undefined trend (NULL)
    rows += [("once", datetime(2024, 1, 1))]
    ev = spark.createDataFrame(rows, ["event_type", "ts"])
    got = {r["event_type"]: r for r in daily_trend_slopes(ev).collect()}
    assert got["up"]["slope_micro"] == 1_000_000
    assert got["flat"]["slope_micro"] == 0
    assert got["once"]["slope_micro"] is None and got["once"]["n_days"] == 1
