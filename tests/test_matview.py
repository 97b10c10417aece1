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
        mv.build(spark, str(tmp_path / "t"), keys=["k"], sums=["x"], source_format="hudi")
