"""Snapshot-pinned table: time travel, isolation, incremental reads
(`crates/cdf-source-iceberg/src/driver.rs:902-1060` semantics)."""

from __future__ import annotations

import pytest

from cdf_spark.expressions.ast import Col
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.positions import TableSnapshotPosition
from cdf_spark.sources.snapshot_table import SnapshotNotFound, SnapshotTable


@pytest.fixture()
def table(spark, tmp_path, orders):
    t = SnapshotTable(tmp_path / "t")
    t.append(orders.select("o_orderkey", "o_totalprice").limit(100))
    return t


def test_snapshot_pinned_read_survives_later_commits(spark, table, orders):
    s1 = table.current_snapshot_id()
    pinned = table.read(spark, snapshot_id=s1)
    assert pinned.count() == 100

    table.append(orders.select("o_orderkey", "o_totalprice").offset(100).limit(250))
    assert table.current_snapshot_id() == s1 + 1
    # old pin still sees exactly the old data; current sees both
    assert table.read(spark, snapshot_id=s1).count() == 100
    assert table.read(spark).count() == 350
    # the previously-built frame is also stable (file list was frozen)
    assert pinned.count() == 100


def test_overwrite_resets_visible_files(spark, table, orders):
    table.overwrite(orders.select("o_orderkey", "o_totalprice").limit(7))
    assert table.read(spark).count() == 7
    # history intact: snapshot 1 still readable
    assert table.read(spark, snapshot_id=1).count() == 100


def test_time_travel_by_timestamp(spark, table, orders):
    s1 = table.snapshot(table.current_snapshot_id())
    table.append(orders.select("o_orderkey", "o_totalprice").offset(100).limit(50))
    s2 = table.snapshot(table.current_snapshot_id())
    # as-of just after s1 but before s2
    assert s2["timestamp_ms"] >= s1["timestamp_ms"]
    got = table.snapshot_as_of(s1["timestamp_ms"])
    assert got["snapshot_id"] in (s1["snapshot_id"], s2["snapshot_id"])
    with pytest.raises(SnapshotNotFound):
        table.snapshot_as_of(s1["timestamp_ms"] - 10_000)


def test_negotiated_scan_pushdown(spark, table):
    df, plan = table.scan(
        spark,
        ScanRequest(
            "t",
            projection=["o_orderkey"],
            predicates=[Col("o_orderkey") > 500],
        ),
    )
    assert [f.name for f in df.schema.fields] == ["o_orderkey"]
    assert all(r.o_orderkey > 500 for r in df.collect())
    # parquet pushdown is INEXACT (zone maps): the plan records both the
    # pushed claim and the engine's residual re-check — FileResource parity
    assert plan.pushed
    from cdf_spark.plans.scan import PushdownFidelity

    assert plan.pushed[0].fidelity is PushdownFidelity.INEXACT
    assert plan.residual


def test_changes_since_incremental(spark, table, orders):
    pos = table.position()
    assert pos == TableSnapshotPosition(1)
    # nothing new yet
    df, pos2 = table.changes_since(spark, pos)
    assert df is None and pos2 == pos

    table.append(orders.select("o_orderkey", "o_totalprice").offset(100).limit(40))
    df, pos3 = table.changes_since(spark, pos)
    assert df.count() == 40  # only the ADDED files, not a re-read
    assert pos3 == TableSnapshotPosition(2)

    # position algebra: max-merge (kernel position_aggregation parity)
    assert pos3.merge(pos) == pos3


def test_missing_snapshot_raises(spark, table):
    with pytest.raises(SnapshotNotFound):
        table.read(spark, snapshot_id=99)
