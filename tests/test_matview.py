"""MaterializedAggregate: incremental refresh equals recompute,
zero-count group drop, crash-before-swap safety, no-op refresh."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.operators.matview import MaterializedAggregate
from cdf_spark.sources.delta import DeltaFixtureWriter


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, x double")


def _recompute(spark, table_root):
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources.delta import DeltaTable

    df, _ = DeltaTable(table_root).scan(spark, ScanRequest("t"))
    return {
        (r["k"]): (r["cnt"], float(r["s"]))
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }


def _view(spark, mv):
    return {
        (r["k"]): (r["cnt"], float(r["sum_x"]))
        for r in mv.read(spark).collect()
    }


def test_refresh_tracks_appends_and_deletes(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, [("a", 1.0), ("a", 2.5), ("b", 4.0)]), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    meta = mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    assert meta["cursor"] == 0
    assert _view(spark, mv) == {"a": (2, 3.5), "b": (1, 4.0)}

    w.append(_rows(spark, [("a", 10.0), ("c", 7.0)]), timestamp_ms=2000)
    w.delete_where(spark, "k = 'b'", timestamp_ms=3000)
    mv.refresh(spark)
    assert _view(spark, mv) == _recompute(spark, str(tmp_path / "t"))
    # group b vanished from the view, exactly as from the recompute
    assert "b" not in _view(spark, mv)


def test_noop_refresh_and_replay_fence(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, [("a", 1.0)]), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    m1 = mv.refresh(spark)
    m2 = mv.refresh(spark)
    assert m1 == m2  # cursor unchanged, version unchanged


def test_crash_before_swap_leaves_previous_state_live(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, [("a", 1.0), ("b", 2.0)]), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    before = _view(spark, mv)
    w.append(_rows(spark, [("a", 5.0)]), timestamp_ms=2000)

    boom = RuntimeError("crash before swap")
    orig = MaterializedAggregate._swap_meta

    def dying(self, meta):
        raise boom

    MaterializedAggregate._swap_meta = dying
    try:
        with pytest.raises(RuntimeError):
            mv.refresh(spark)
    finally:
        MaterializedAggregate._swap_meta = orig
    # previous state and cursor still live
    assert _view(spark, mv) == before
    # the retried refresh folds the same window exactly once
    mv.refresh(spark)
    assert _view(spark, mv) == _recompute(spark, str(tmp_path / "t"))


def test_reclaim_keeps_live_and_previous(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, [("a", 1.0)]), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    for i in range(3):
        w.append(_rows(spark, [("a", float(i))]), timestamp_ms=2000 + i * 1000)
        mv.refresh(spark)
    dirs = sorted(p.name for p in (tmp_path / "mv").glob("state_v*"))
    assert dirs == ["state_v3", "state_v4"]


def test_build_rejects_reinit_and_bad_spec(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, [("a", 1.0)]), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    with pytest.raises(ValueError, match="already initialized"):
        mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    mv2 = MaterializedAggregate(tmp_path / "mv2")
    with pytest.raises(ValueError, match="at least one"):
        mv2.build(spark, str(tmp_path / "t"), keys=[], sums=["x"])
    with pytest.raises(ValueError, match="not initialized"):
        mv2.refresh(spark)


def test_iceberg_refresh_tracks_upserts(spark, tmp_path):
    from cdf_spark.sources.iceberg import IcebergFixtureWriter, IcebergTable

    w = IcebergFixtureWriter(tmp_path / "t", seed=7)
    w.append(
        spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 4.0)], "k string, x double"),
        timestamp_ms=1000,
        snapshot_id=101,
    )
    mv = MaterializedAggregate(tmp_path / "mv")
    meta = mv.build(
        spark, str(tmp_path / "t"), keys=["k"], sums=["x"], source_format="iceberg"
    )
    assert meta["cursor"] == 101 and meta["format"] == "iceberg"
    assert _view(spark, mv) == {"a": (2, 3.0), "b": (1, 4.0)}

    # an upsert keyed on k replaces EVERY 'a' row with the batch
    # (equality delete) and inserts 'c'
    w.upsert(
        spark.createDataFrame([("a", 10.0), ("c", 7.0)], "k string, x double"),
        ["k"],
        timestamp_ms=2000,
        snapshot_id=55,  # smaller than parent: ancestry, not ordering
    )
    m2 = mv.refresh(spark)
    assert m2["cursor"] == 55
    assert _view(spark, mv) == {"a": (1, 10.0), "c": (1, 7.0), "b": (1, 4.0)}
    # matches the from-scratch aggregate of the current snapshot
    from pyspark.sql import functions as F

    cur = IcebergTable(str(tmp_path / "t")).read(spark)
    expect = {
        r["k"]: (r["cnt"], float(r["s"]))
        for r in cur.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert _view(spark, mv) == expect
    assert mv.refresh(spark) == m2  # no-op


def test_build_rejects_unknown_format(spark, tmp_path):
    mv = MaterializedAggregate(tmp_path / "mv")
    with pytest.raises(ValueError, match="unknown source format"):
        mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"], source_format="csv")


def test_null_group_key_refresh_matches_recompute(spark, tmp_path):
    """NULL is a first-class GROUP BY value: a NULL-keyed group present
    in both state and delta must merge into ONE row (null-safe key
    equality), not survive as two."""
    rows = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 3.0)], "k string, x double"
    )
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(rows, timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"])
    w.append(
        spark.createDataFrame([(None, 10.0)], "k string, x double"), timestamp_ms=2000
    )
    mv.refresh(spark)
    got = mv.read(spark).collect()
    assert len(got) == 2  # exactly one NULL-keyed row
    null_row = next(r for r in got if r["k"] is None)
    assert (null_row["cnt"], float(null_row["sum_x"])) == (3, 15.0)
    assert _view(spark, mv) == _recompute(spark, str(tmp_path / "t"))


def _minmax_view(spark, mv):
    return {
        r["k"]: (
            r["cnt"],
            None if r["min_x"] is None else float(r["min_x"]),
            None if r["max_x"] is None else float(r["max_x"]),
        )
        for r in mv.read(spark).collect()
    }


def _minmax_recompute(spark, table_root):
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources.delta import DeltaTable

    df, _ = DeltaTable(table_root).scan(spark, ScanRequest("t"))
    return {
        r["k"]: (
            r["cnt"],
            None if r["mn"] is None else float(r["mn"]),
            None if r["mx"] is None else float(r["mx"]),
        )
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    }


def test_minmax_survives_delete_of_current_extreme(spark, tmp_path):
    """Deleting the current MIN and MAX must surface the next candidate
    from the heap — no full recompute, refresh == from-scratch."""
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(
        _rows(spark, [("a", 1.0), ("a", 2.0), ("a", 9.0), ("b", 4.0)]),
        timestamp_ms=1000,
    )
    mv = MaterializedAggregate(tmp_path / "mv")
    meta = mv.build(
        spark, str(tmp_path / "t"), keys=["k"], sums=[], mins=["x"], maxs=["x"]
    )
    assert meta["mins"] == ["x"] and meta["maxs"] == ["x"]
    assert _minmax_view(spark, mv) == {"a": (3, 1.0, 9.0), "b": (1, 4.0, 4.0)}
    w.delete_where(spark, "x = 1.0 OR x = 9.0", timestamp_ms=2000)  # both extremes of 'a'
    mv.refresh(spark)
    assert _minmax_view(spark, mv) == _minmax_recompute(spark, str(tmp_path / "t"))
    assert _minmax_view(spark, mv)["a"] == (1, 2.0, 2.0)


def test_minmax_heap_drain_triggers_partial_recompute(spark, tmp_path):
    """extreme_k=2 with 3+ smaller deletes drains the MIN heap below its
    bound: the fence must heal the group from the snapshot, exactly."""
    vals = [("a", float(v)) for v in range(1, 11)] + [("b", 100.0)]
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(_rows(spark, vals), timestamp_ms=1000)
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(
        spark, str(tmp_path / "t"), keys=["k"], sums=["x"], mins=["x"], extreme_k=2
    )
    # heap for 'a' = [1,2], bound = 3; delete 1,2,3 -> heap drains
    w.delete_where(spark, "x <= 3.0", timestamp_ms=2000)
    mv.refresh(spark)
    got = {r["k"]: float(r["min_x"]) for r in mv.read(spark).collect()}
    assert got == {"a": 4.0, "b": 100.0}
    # healed heap is freshly complete-or-bounded: next eviction works too
    w.delete_where(spark, "x = 4.0", timestamp_ms=3000)
    mv.refresh(spark)
    got = {r["k"]: float(r["min_x"]) for r in mv.read(spark).collect()}
    assert got == {"a": 5.0, "b": 100.0}
    assert _view(spark, mv) == _recompute(spark, str(tmp_path / "t"))


def test_minmax_all_null_values_serve_null(spark, tmp_path):
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(
        spark.createDataFrame([("a", None), ("b", 2.0)], "k string, x double"),
        timestamp_ms=1000,
    )
    mv = MaterializedAggregate(tmp_path / "mv")
    mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=[], mins=["x"])
    got = {r["k"]: r["min_x"] for r in mv.read(spark).collect()}
    assert got["a"] is None and float(got["b"]) == 2.0
    # inserting a value into the all-null group starts serving it
    w.append(
        spark.createDataFrame([("a", 5.0)], "k string, x double"), timestamp_ms=2000
    )
    mv.refresh(spark)
    got = {r["k"]: r["min_x"] for r in mv.read(spark).collect()}
    assert float(got["a"]) == 5.0


def test_hudi_mor_refresh_tracks_upserts_and_deletes(spark, tmp_path):
    """Hudi MoR leg: pre-images derived as a two-snapshot diff confined
    to touched keys; refresh == recompute through upsert + delete, and
    a compaction-only window advances the cursor with a zero delta."""
    from cdf_spark.sources.hudi_mor import HudiMorFixtureWriter, HudiMorTable

    rows = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 4.0)], "id int, k string, x double"
    )
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="id", n_buckets=2)
    w.insert(rows)
    mv = MaterializedAggregate(tmp_path / "mv")
    meta = mv.build(
        spark, str(tmp_path / "t"), keys=["k"], sums=["x"], source_format="hudi"
    )
    assert meta["format"] == "hudi" and isinstance(meta["cursor"], str)
    assert _view(spark, mv) == {"a": (2, 3.0), "b": (1, 4.0)}

    # upsert moves id=2 from group a to group c; delete removes id=3
    w.upsert(spark.createDataFrame([(2, "c", 7.0)], "id int, k string, x double"))
    w.delete(spark.createDataFrame([(3,)], "id int"))
    mv.refresh(spark)

    t = HudiMorTable(tmp_path / "t")
    snap = t.snapshot(spark)
    expect = {
        r["k"]: (r["cnt"], float(r["s"]))
        for r in snap.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert _view(spark, mv) == expect == {"a": (1, 1.0), "c": (1, 7.0)}

    # compaction-only window: cursor advances, values unchanged
    before = _view(spark, mv)
    assert w.compact(spark) is not None
    m2 = mv.refresh(spark)
    assert m2["cursor"] == t.latest_instant()
    assert _view(spark, mv) == before
