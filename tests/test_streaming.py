"""Streaming: watermark ledger, partition combination, drain pipeline."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdf_spark.contracts import Contract, RangeRule
from cdf_spark.package.ledger import ParquetDestination
from cdf_spark.sources.base import ResourceDescriptor, WriteDisposition
from cdf_spark.streaming import (
    DrainTermination,
    EpochPolicy,
    StreamExtent,
    StreamingLoadPipeline,
    WatermarkLedger,
    WatermarkPolicy,
    combine_partition_watermarks,
)
from cdf_spark.streaming.epochs import DrainState
from cdf_spark.streaming.watermark import observed_frontier


def test_watermark_ledger_monotone(tmp_path):
    led = WatermarkLedger(tmp_path, "r1")
    assert led.current("ts") is None
    assert led.advance("ts", 100) == 100
    assert led.advance("ts", 150) == 150
    # regression clamps and records
    assert led.advance("ts", 120) == 150
    led2 = WatermarkLedger(tmp_path, "r1")
    assert led2.current("ts") == 150
    assert any(h["clamped"] for h in led2.state["history"])


def test_watermark_non_timestamp_domains(tmp_path):
    led = WatermarkLedger(tmp_path, "r2")
    # integer domain
    assert led.advance("seq", 42) == 42
    # decimal-ish domain
    assert led.advance("amount", 10.5) == 10.5
    assert led.advance("amount", 9.0) == 10.5


def test_combine_partition_watermarks_minimum_all():
    policy = WatermarkPolicy("ts", combine="minimum_all")
    marks = {"p0": (100, 0), "p1": (50, 0), "p2": (200, 0)}
    assert combine_partition_watermarks(marks, policy) == 50


def test_combine_partition_watermarks_idle_exclusion():
    policy = WatermarkPolicy("ts", combine="minimum_eligible", idle_after_ms=1000)
    now = 10_000
    marks = {"live": (200, 9_800), "stalled": (50, 1_000)}
    # stalled partition idle >1s: excluded
    assert combine_partition_watermarks(marks, policy, now_ms=now) == 200
    # all idle -> fall back to minimum_all
    marks = {"a": (70, 0), "b": (90, 0)}
    assert combine_partition_watermarks(marks, policy, now_ms=now) == 70


def test_observed_frontier_temporal_and_numeric(spark):
    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    df = spark.createDataFrame([(1, ts, 100)], "id long, ts timestamp, seq long")
    f = observed_frontier(df, WatermarkPolicy("ts", delay=60.0))
    assert f == ts - datetime.timedelta(seconds=60)
    f = observed_frontier(df, WatermarkPolicy("seq", delay=10))
    assert f == 90


def test_epoch_policy_rotation():
    p = EpochPolicy(max_rows=100, max_bytes=1000, max_duration_ms=5000)
    assert p.rotation_due(rows=100, bytes_=0, started_ms=0, now_ms=1) == "rows"
    assert p.rotation_due(rows=0, bytes_=1000, started_ms=0, now_ms=1) == "bytes"
    assert p.rotation_due(rows=0, bytes_=0, started_ms=0, now_ms=6000) == "duration"
    assert p.rotation_due(rows=1, bytes_=1, started_ms=0, now_ms=1) is None


def test_drain_termination_budgets():
    t = DrainTermination(quiescent_batches=2, max_records=1000)
    s = DrainState()
    s.observe_batch(600)
    assert t.should_stop(s) is None
    s.observe_batch(500)
    assert t.should_stop(s) == "records"
    s2 = DrainState()
    s2.observe_batch(0)
    assert t.should_stop(s2) is None
    s2.observe_batch(0)
    assert t.should_stop(s2) == "quiescent"


EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    df = spark.createDataFrame(
        [(i, i * 10, float(i)) for i in range(1, 21)], EVENT_SCHEMA
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    return src


def test_streaming_drain_end_to_end(spark, tmp_path, stream_dir):
    """Drain extent: availableNow over a file stream, epochs commit
    packages + receipts, watermark advances, late rows quarantined on
    the next epoch."""
    dest = ParquetDestination(tmp_path / "dest")
    pipe = StreamingLoadPipeline(
        descriptor=ResourceDescriptor("ev", primary_key=["event_id"]),
        source_path=str(stream_dir) + "/*",
        schema=EVENT_SCHEMA,
        contract=Contract(rules=[RangeRule("value", min=0.0, max=1e9)]),
        watermark=WatermarkPolicy("seq", delay=20),
        late_action="quarantine",
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        destination=dest,
        extent=StreamExtent.DRAIN,
    )
    epochs = pipe.run(spark)
    assert len(epochs) == 1
    ep = epochs[0]
    assert ep.rows_admitted == 20 and ep.receipt_verified
    assert ep.watermark_after == 180  # max(seq)=200 - delay 20
    assert spark.read.parquet(str(tmp_path / "dest")).count() == 20

    # second micro-batch arrives: 2 late rows (seq <= 180), 2 on time
    late_batch = spark.createDataFrame(
        [(100, 150, 1.0), (101, 170, 1.0), (102, 210, 1.0), (103, 220, 1.0)], EVENT_SCHEMA
    )
    late_batch.coalesce(1).write.mode("overwrite").parquet(str(stream_dir / "batch2"))
    pipe.epochs = []
    epochs = pipe.run(spark)
    assert len(epochs) == 1
    ep = epochs[0]
    assert ep.rows_late == 2
    assert ep.rows_admitted == 2
    assert ep.watermark_after == 200  # 220 - 20
    assert spark.read.parquet(str(tmp_path / "dest")).count() == 22

    # third run: nothing new -> no epochs (exactly-once per file)
    pipe.epochs = []
    assert pipe.run(spark) == []


def test_streaming_recapture_carryover(spark, tmp_path):
    """Recaptured late rows persist as carryover and rejoin the next
    epoch's batch (LateDataCarryoverRef parity): once the watermark
    passes them they admit; until then they keep carrying."""
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame([(1, 100, 1.0), (2, 200, 1.0)], EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b1")
    )
    pipe = StreamingLoadPipeline(
        descriptor=ResourceDescriptor("rc", primary_key=["event_id"]),
        source_path=str(src) + "/*",
        schema=EVENT_SCHEMA,
        watermark=WatermarkPolicy("seq", delay=0),
        late_action="recapture",
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        destination=ParquetDestination(tmp_path / "dest"),
        extent=StreamExtent.DRAIN,
    )
    eps = pipe.run(spark)
    assert eps[0].rows_admitted == 2 and eps[0].rows_late == 0
    assert eps[0].watermark_after == 200

    # next batch: one late row (seq 150 <= wm 200) -> recaptured, not lost
    spark.createDataFrame([(3, 150, 1.0), (4, 300, 1.0)], EVENT_SCHEMA).coalesce(1).write.parquet(
        str(src / "b2")
    )
    pipe.epochs = []
    eps = pipe.run(spark)
    assert eps[0].rows_admitted == 1       # only seq 300
    assert eps[0].rows_late == 1           # seq 150 carried over
    assert eps[0].watermark_after == 300

    # next batch advances beyond the carried row? no: wm=300 > 150, so it
    # carries again; a future-seq batch keeps it late forever (honest) —
    # the carryover row is re-presented each epoch, never dropped.
    spark.createDataFrame([(5, 400, 1.0)], EVENT_SCHEMA).coalesce(1).write.parquet(str(src / "b3"))
    pipe.epochs = []
    eps = pipe.run(spark)
    assert eps[0].rows_admitted == 1       # seq 400
    assert eps[0].rows_late == 1           # 150 still carried (wm monotone)
    total_committed = spark.read.parquet(str(tmp_path / "dest")).count()
    assert total_committed == 4            # 2 + 1 + 1; the late row not duplicated


def test_resident_extent_live_epochs(spark, tmp_path):
    """RESIDENT: processingTime trigger returns a live query handle;
    files arriving AFTER start are picked up in later epochs, each
    committed through the package path; caller stops the query."""
    import time as _time

    from cdf_spark.package.ledger import ParquetDestination

    import shutil
    import tempfile as _tempfile
    from pathlib import Path

    src = tmp_path / "in"
    src.mkdir()

    def _land(df, name):
        # continuous file discovery lists only FLAT files (unlike
        # availableNow's initial listing, which recurses) — land each
        # batch as a single file in the watched dir
        stage = _tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        (f,) = Path(stage).glob("*.parquet")
        shutil.move(str(f), str(src / name))
        shutil.rmtree(stage, ignore_errors=True)

    df1 = spark.createDataFrame([(i, i * 10, float(i)) for i in range(1, 11)], EVENT_SCHEMA)
    _land(df1, "b1.parquet")

    pipe = StreamingLoadPipeline(
        descriptor=ResourceDescriptor("res_ev", primary_key=["event_id"]),
        source_path=str(src),
        schema=EVENT_SCHEMA,
        package_root=str(tmp_path / "pkgs"),
        ledger_root=str(tmp_path / "ledger"),
        destination=ParquetDestination(tmp_path / "dest"),
        extent=StreamExtent.RESIDENT,
    )
    q = pipe.run(spark)
    try:
        deadline = _time.time() + 60
        while not pipe.epochs and _time.time() < deadline:
            _time.sleep(0.5)
        assert pipe.epochs, "first epoch never fired"
        # late-arriving file -> a later epoch picks it up
        df2 = spark.createDataFrame(
            [(i, i * 10, float(i)) for i in range(11, 16)], EVENT_SCHEMA
        )
        _land(df2, "b2.parquet")
        while (
            sum(e.rows_admitted for e in pipe.epochs) < 15 and _time.time() < deadline
        ):
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    committed = [e for e in pipe.epochs if e.rows_admitted > 0]
    assert len(committed) >= 2  # the resident stream kept consuming
    assert all(e.receipt_verified for e in committed)
    import pyspark.sql.functions as F

    out = spark.read.parquet(str(tmp_path / "dest"))
    assert out.count() == 15
    assert out.agg(F.countDistinct("event_id")).collect()[0][0] == 15


# ---------------------------------------------------------------------------
# Stream-stream join semantics (symmetric hash join + watermark state)


def _ssj_write_file(df, dest, mtime):
    import os
    import shutil
    import tempfile
    from pathlib import Path

    stage = tempfile.mkdtemp(prefix="ssj_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    (src,) = sorted(Path(stage).glob("*.parquet"))
    shutil.move(str(src), dest)
    shutil.rmtree(stage, ignore_errors=True)
    os.utime(dest, (mtime, mtime))


def _ssj_run(spark, in_dir, out_dir, ck_dir, delay="8 hours"):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .filter(F.col("kind") == "c")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", delay)
    )
    purchases = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .filter(F.col("kind") == "p")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", delay)
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("click_ts"))
        & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 4 HOURS")),
        "inner",
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.trigger(availableNow=True)
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck_dir))
        .start()
    )
    q.awaitTermination()
    return {(r.click_id, r.purchase_id) for r in spark.read.parquet(str(out_dir)).collect()}


def _ssj_fixture_rows():
    """Two days of (click, purchase-within-4h) pairs per user, one
    cross-day NON-match (gap > 4h), plus a cross-FILE match near the
    day boundary."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0

    def ev(day, hour, user, kind, minute=0):
        nonlocal eid
        eid += 1
        return (eid, base + dt.timedelta(days=day, hours=hour, minutes=minute), user, kind)

    day0 = [
        ev(0, 1, 1, "c"), ev(0, 3, 1, "p"),      # match (2h gap)
        ev(0, 2, 2, "c"), ev(0, 9, 2, "p"),      # no match (7h gap)
        ev(0, 22, 3, "c"),                        # click near boundary
    ]
    day1 = [
        ev(1, 1, 3, "p"),                         # cross-file match (3h gap)
        ev(1, 5, 4, "c"), ev(1, 6, 4, "p"),      # match (1h gap)
    ]
    return day0, day1


def test_stream_stream_join_time_ordered_equals_batch(spark, tmp_path):
    """Files arriving in event-time order with watermark delay > join
    window: the drain emits EXACTLY the batch join's matches, including
    the pair that spans two micro-batches (join state carried across
    the epoch boundary, not evicted early)."""
    day0, day1 = _ssj_fixture_rows()
    cols = ["event_id", "ts", "user_id", "kind"]
    (tmp_path / "in").mkdir()
    _ssj_write_file(spark.createDataFrame(day0, cols), str(tmp_path / "in" / "f0.parquet"), 1_000)
    _ssj_write_file(spark.createDataFrame(day1, cols), str(tmp_path / "in" / "f1.parquet"), 2_000)
    got = _ssj_run(spark, tmp_path / "in", tmp_path / "out", tmp_path / "ck", delay="8 hours")
    assert got == {(1, 2), (5, 6), (7, 8)}  # incl. cross-batch (5, 6)


def test_stream_stream_join_late_arrival_state_evicted(spark, tmp_path):
    """Out-of-order arrival with a tight watermark: the join state a
    late row needed is EVICTED before it arrives, so the cross-batch
    match is dropped — while same-batch matches among late rows still
    emit (Spark joins a batch's own rows before watermark cleanup).
    This is the state-bounding tradeoff the wide-delay registry query
    avoids, and the falsification that the watermark actually governs
    join state, not just decorates the plan."""
    import datetime as dt

    day0, day1 = _ssj_fixture_rows()
    base = dt.datetime(2024, 3, 1)
    # a day-2 filler batch that advances the watermark far past day 1
    day2 = [(100, base + dt.timedelta(days=2, hours=6), 99, "c")]
    cols = ["event_id", "ts", "user_id", "kind"]
    (tmp_path / "in").mkdir()
    _ssj_write_file(spark.createDataFrame(day1, cols), str(tmp_path / "in" / "f0.parquet"), 1_000)
    _ssj_write_file(spark.createDataFrame(day2, cols), str(tmp_path / "in" / "f1.parquet"), 2_000)
    _ssj_write_file(spark.createDataFrame(day0, cols), str(tmp_path / "in" / "f2.parquet"), 3_000)
    got = _ssj_run(spark, tmp_path / "in", tmp_path / "out", tmp_path / "ck", delay="1 hour")
    # day-1's in-batch match survives; EVERY day-0 match is dropped —
    # the whole late file lands behind the watermark (which lags one
    # batch, hence the day-2 filler) and its rows are filtered on
    # input, including the same-batch pair (1, 2)
    assert got == {(7, 8)}


def test_resident_restart_exactly_once(spark, tmp_path):
    """RESIDENT pipeline killed mid-stream and RESTARTED from the same
    Spark checkpoint (a fresh pipeline object, as a new process would
    build): committed epochs are NOT reprocessed, data landed while
    the stream was down is picked up, a crash-replayed epoch id is
    skipped by the checkpoint-ledger guard, and auto-maintenance fires
    every N verified epochs — exactly-once delivery through
    commit/verify across the restart (drain_epoch.rs:1-1258 parity)."""
    import shutil
    import tempfile as _tempfile
    import time as _time
    from pathlib import Path

    from cdf_spark.package.delta_dest import DeltaDestination
    from cdf_spark.package.ledger import CheckpointLedger
    from cdf_spark.package.maintenance import MaintenancePolicy
    from cdf_spark.sources.delta import DeltaTable
    from cdf_spark.streaming.epochs import EpochPolicy

    src = tmp_path / "in"
    src.mkdir()

    def _land(rows, name):
        stage = _tempfile.mkdtemp()
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (f,) = Path(stage).glob("*.parquet")
        shutil.move(str(f), str(src / name))
        shutil.rmtree(stage, ignore_errors=True)

    def _pipe():
        # built fresh per run, exactly like a new driver process would
        return StreamingLoadPipeline(
            descriptor=ResourceDescriptor("restart_ev", primary_key=["event_id"]),
            source_path=str(src),
            schema=EVENT_SCHEMA,
            package_root=str(tmp_path / "pkgs"),
            ledger_root=str(tmp_path / "ledger"),
            destination=DeltaDestination(tmp_path / "dest"),
            extent=StreamExtent.RESIDENT,
            epoch_policy=EpochPolicy(trigger_interval="1 seconds"),
            maintenance_every_epochs=2,
            maintenance_policy=MaintenancePolicy(
                small_file_bytes=1 << 30, min_small_files=2
            ),
        )

    def _wait(pred, deadline_s=90):
        deadline = _time.time() + deadline_s
        while not pred() and _time.time() < deadline:
            _time.sleep(0.5)
        assert pred(), "condition not reached before deadline"

    _land([(i, i * 10, float(i)) for i in range(1, 11)], "b1.parquet")
    pipe_a = _pipe()
    q = pipe_a.run(spark)
    try:
        _wait(lambda: sum(e.rows_admitted for e in pipe_a.epochs) >= 10)
        _land([(i, i * 10, float(i)) for i in range(11, 16)], "b2.parquet")
        _wait(lambda: sum(e.rows_admitted for e in pipe_a.epochs) >= 15)
        # the 2nd verified epoch triggers maintenance — let it finish
        # so the kill lands at an epoch boundary, not mid-maintenance
        _wait(lambda: pipe_a.maintenance_reports)
    finally:
        q.stop()  # the kill
        q.awaitTermination()
    assert sum(e.rows_admitted for e in pipe_a.epochs) == 15
    # maintenance fired on the verified-epoch cadence
    assert pipe_a.maintenance_reports, "auto-maintenance never fired"

    # stream is DOWN; more data lands
    _land([(i, i * 10, float(i)) for i in range(16, 21)], "b3.parquet")

    pipe_b = _pipe()
    q2 = pipe_b.run(spark)
    try:
        _wait(lambda: sum(e.rows_admitted for e in pipe_b.epochs) >= 5)
        # settle one extra trigger to catch any wrongful reprocessing
        _time.sleep(2.0)
    finally:
        q2.stop()
        q2.awaitTermination()
    # the restarted query processed ONLY the while-down data
    assert sum(e.rows_admitted for e in pipe_b.epochs) == 5

    out = DeltaTable(tmp_path / "dest").read(spark)
    assert out.count() == 20  # no loss, no duplication
    assert out.select("event_id").distinct().count() == 20

    # crash-replay: Spark re-invokes foreachBatch with an ALREADY
    # COMMITTED epoch id after a crash between sink commit and offset
    # commit — the ledger guard must skip it, not double-commit
    committed = [e for e in pipe_b.epochs if e.package_id is not None]
    assert committed
    replay_id = committed[0].epoch_id
    ck = CheckpointLedger(str(tmp_path / "ledger"))
    assert ck.epoch_committed("restart_ev", replay_id)
    pipe_b.epochs = []
    batch = spark.createDataFrame([(99, 990, 9.9)], EVENT_SCHEMA)
    pipe_b._process_epoch(batch, replay_id)
    assert pipe_b.epochs[0].package_id is None  # replay signature
    assert pipe_b.epochs[0].receipt_verified
    assert DeltaTable(tmp_path / "dest").read(spark).count() == 20  # unchanged


def test_sliding_window_drain_matches_batch(spark, tmp_path):
    """Sliding-interval windows under a watermarked streaming drain
    (r14): the SAME F.window(ts, 10min, 5min) aggregation that backs
    the batch `sliding_window_agg` query runs as an append-mode
    availableNow drain; every window the watermark has closed must
    equal the batch aggregation bit-for-bit, and the not-yet-closed
    sentinel window is withheld (the late-data contract, not a loss)."""
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + timedelta(seconds=37 * i % 1800), "click" if i % 3 else "view", float(i))
        for i in range(40)
    ]
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(rows[:20], schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(rows[20:], schema).coalesce(1).write.parquet(str(src / "f2"))
    # sentinel far past every real window: advances the watermark so
    # every real window closes; its own window stays open and withheld
    spark.createDataFrame(
        [(base + timedelta(days=1), "view", 0.0)], schema
    ).coalesce(1).write.parquet(str(src / "f3"))

    def agg(df):
        return (
            df.groupBy(F.window("ts", "600 seconds", "300 seconds"), F.col("event_type"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
            )
            .select(
                F.col("window.start").cast("long").alias("start_s"),
                "event_type",
                "n",
                "total_value",
            )
        )

    out_dir, ck_dir = tmp_path / "out", tmp_path / "ck"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    q = (
        agg(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ck_dir))
        .start()
    )
    q.awaitTermination()

    drained = {
        (r.start_s, r.event_type): (r.n, r.total_value)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    batch = {
        (r.start_s, r.event_type): (r.n, r.total_value)
        for r in agg(spark.createDataFrame(rows, schema)).collect()
    }
    assert drained == batch and len(batch) > 4
