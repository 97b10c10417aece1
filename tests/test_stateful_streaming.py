"""applyInPandasWithState operators: cross-batch keyed state that
survives a stream RESTART (state store recovered from the checkpoint).

Reference parity: Resident-extent keyed state — contract dedup
`keep: First` across epochs (`crates/cdf-contract/src/policy.rs:263-275`)
and per-key session accumulators (`crates/cdf-kernel/src/effect.rs:162-180`
input-order state discipline).

Timeouts are EVENT-time (watermark) driven, so every test is
deterministic: feeding a later-timestamped file advances the watermark
past the TTL/gap and fires the timeout on the next run — no sleeps.

Sink note: the memory sink rejects checkpoint recovery, so restarts
write through a parquet sink (recovery-capable) and assertions read the
cumulative output directory."""

from __future__ import annotations

from pyspark.sql import types as T

from cdf_spark.streaming.stateful import streaming_dedup_first, streaming_session_agg

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("ts", T.LongType()),
    ]
)


def _run_stream(spark, src, ckpt, out_dir, build):
    sdf = spark.readStream.schema(SCHEMA).parquet(str(src) + "/*")
    q = (
        build(sdf)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not drain in time"
    assert q.exception() is None
    try:
        return spark.read.parquet(str(out_dir))
    except Exception:  # no output committed yet -> empty
        return spark.createDataFrame([], SCHEMA)


def test_streaming_dedup_first_across_restarts(spark, tmp_path):
    """A key admitted in run 1 stays deduped in run 2 — the state store
    is recovered from the checkpoint, proving Resident-extent dedup is
    per-stream-lifetime, not per-micro-batch."""
    src, ckpt, out = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    src.mkdir()
    spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 11), ("b", 3, 12)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))

    build = lambda s: streaming_dedup_first(s, ["k"])
    got1 = {r.k: r.v for r in _run_stream(spark, src, ckpt, out, build).collect()}
    assert set(got1) == {"a", "b"}
    assert got1["a"] == 1  # first occurrence wins inside the batch too

    # restart with an overlapping key: only the new key emits
    spark.createDataFrame(
        [("b", 9, 20), ("c", 4, 21)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))
    got2 = {r.k: r.v for r in _run_stream(spark, src, ckpt, out, build).collect()}
    assert got2 == {"a": 1, "b": 3, "c": 4}, (
        f"state must survive the restart (b must NOT re-emit), got {got2}"
    )


def test_streaming_session_agg_emits_on_gap_timeout(spark, tmp_path):
    """Sessions close via watermark gap: run 1 accumulates state (no
    output), run 2's later events advance the watermark past
    session_end + gap and fire the timeout — exactly one session row
    with the accumulated bounds."""
    src, ckpt, out = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    src.mkdir()
    spark.createDataFrame(
        [("u1", 0, 100), ("u1", 0, 160), ("u1", 0, 130)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))

    build = lambda s: streaming_session_agg(s, key="k", ts_col="ts", gap_ms=500)
    out1 = _run_stream(spark, src, ckpt, out, build)
    assert out1.count() == 0  # session still open (watermark at 160 < 660)

    # u2@900 pushes the watermark past u1's end+gap (160+500=660)
    spark.createDataFrame([("u2", 0, 900)], SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    out2 = _run_stream(spark, src, ckpt, out, build)
    rows = {r.key: r for r in out2.collect()}
    assert "u1" in rows, "watermark past the gap must close u1's session"
    s = rows["u1"]
    assert (s.session_start, s.session_end, s.n_events) == (100, 160, 3)
    assert "u2" not in rows  # u2's session is still open (timeout at 1400)


def test_streaming_dedup_ttl_bounds_state(spark, tmp_path):
    """With an event-time TTL, an expired key re-admits — bounded state
    for unbounded key domains (the documented trade)."""
    src, ckpt, out = tmp_path / "in", tmp_path / "ck", tmp_path / "out"
    src.mkdir()
    spark.createDataFrame([("a", 1, 10)], SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    build = lambda s: streaming_dedup_first(s, ["k"], state_ttl_ms=400, ts_col="ts")
    assert _run_stream(spark, src, ckpt, out, build).count() == 1

    # z@1000 advances the watermark past a's admission + TTL (0+400)
    spark.createDataFrame([("z", 7, 1000)], SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    got = {r.k for r in _run_stream(spark, src, ckpt, out, build).collect()}
    assert got == {"a", "z"}

    # ...so the same key arriving again re-admits
    spark.createDataFrame([("a", 5, 1100)], SCHEMA).coalesce(1).write.parquet(str(src / "b3"))
    got = {(r.k, r.v) for r in _run_stream(spark, src, ckpt, out, build).collect()}
    assert ("a", 5) in got, f"expired key must re-admit, got {got}"
