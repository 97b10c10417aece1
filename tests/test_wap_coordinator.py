"""Multi-table Write-Audit-Publish coordination (`package/wap.py`):
branch-staged loads across N tables become visible together behind one
durable intent record; a crash between fast-forwards recovers to
all-published, never torn."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.package.wap import WapPublishCoordinator, WapPublishError
from cdf_spark.sources.iceberg import IcebergFixtureWriter, IcebergTable


@pytest.fixture()
def two_staged(tmp_path, orders):
    """Two tables, each with a base commit on main and one load staged
    on branch 'cycle'."""
    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    paths = []
    for i, (lo, hi) in enumerate([(0, 100), (200, 300)]):
        p = tmp_path / f"t{i}"
        w = IcebergFixtureWriter(p, seed=90 + i)
        w.append(o.filter(f"o_orderkey > {lo} AND o_orderkey <= {hi}"), timestamp_ms=1_000)
        w.append(
            o.filter(f"o_orderkey > {hi} AND o_orderkey <= {hi + 50}"),
            timestamp_ms=2_000,
            branch="cycle",
        )
        paths.append(p)
    return paths, o


def _counts(spark, paths):
    return [IcebergTable(p).read(spark).count() for p in paths]


def test_publish_all_is_atomic_visibility(spark, tmp_path, two_staged):
    paths, o = two_staged
    co = WapPublishCoordinator(tmp_path / "wap")
    for p in paths:
        co.stage(p, "cycle")
    base = _counts(spark, paths)
    done = co.publish_all()
    assert len(done["published"]) == 2
    after = _counts(spark, paths)
    assert all(a == b + 50 for a, b in zip(after, base))
    assert WapPublishCoordinator.pending(tmp_path / "wap") == []  # intent retired


def test_crash_mid_publish_recovers_to_all(spark, tmp_path, two_staged):
    """Crash after table 0 published: the live intent names the cycle;
    recover() completes table 1 idempotently; nothing is torn after
    recovery and the intent retires."""
    paths, o = two_staged
    co = WapPublishCoordinator(tmp_path / "wap")
    for p in paths:
        co.stage(p, "cycle")
    with pytest.raises(WapPublishError, match="chaos"):
        co.publish_all(_crash_after=1)
    pend = WapPublishCoordinator.pending(tmp_path / "wap")
    assert len(pend) == 1 and len(pend[0]["published"]) == 1  # torn mid-cycle
    done = WapPublishCoordinator.recover(tmp_path / "wap")
    assert len(done) == 1 and len(done[0]["published"]) == 2
    assert WapPublishCoordinator.pending(tmp_path / "wap") == []
    t0, t1 = (IcebergTable(p) for p in paths)
    assert t0.read(spark).count() == t1.read(spark).count() == 150
    # recovery is idempotent: nothing pending, nothing to do
    assert WapPublishCoordinator.recover(tmp_path / "wap") == []


def test_stage_guards(spark, tmp_path, orders):
    o = orders.select("o_orderkey", "o_totalprice").limit(20)
    p = tmp_path / "t"
    w = IcebergFixtureWriter(p, seed=99)
    w.append(o, timestamp_ms=1_000)
    co = WapPublishCoordinator(tmp_path / "wap")
    with pytest.raises(WapPublishError, match="does not exist"):
        co.stage(p, "nope")
    IcebergTable(p).create_branch("empty")  # forked at head, nothing staged
    with pytest.raises(WapPublishError, match="nothing staged"):
        co.stage(p, "empty")
    with pytest.raises(WapPublishError, match="nothing staged"):
        co.publish_all()


def test_diverged_main_fails_loudly_and_recovery_surfaces_it(
    spark, tmp_path, two_staged, orders
):
    """If main moved after staging (the fork is stale), the publish
    refuses at that table and the intent stays live — the operator
    decides (rebase or drop), nothing silently drops commits."""
    paths, o = two_staged
    co = WapPublishCoordinator(tmp_path / "wap")
    for p in paths:
        co.stage(p, "cycle")
    # diverge table 1's main AFTER staging
    w = IcebergFixtureWriter(paths[1])
    w.append(o.filter("o_orderkey > 900 AND o_orderkey <= 910"), timestamp_ms=3_000)
    with pytest.raises(Exception, match="diverged"):
        co.publish_all()
    pend = WapPublishCoordinator.pending(tmp_path / "wap")
    assert len(pend) == 1 and pend[0]["published"] == [str(paths[0].resolve())]
    # table 0 IS published (per-table atomicity is Iceberg's), table 1
    # held back — recovery keeps failing until the operator resolves
    with pytest.raises(Exception, match="diverged"):
        WapPublishCoordinator.recover(tmp_path / "wap")
