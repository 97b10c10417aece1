"""IcebergDestination merge_mode='position' — the Spark/Trino MERGE
commit shape: executor-written positional-delete files + the batch's
data files in one 'overwrite' snapshot.

Pinned here: relational equivalence with equality mode across chained
batches (incl. delete-then-reinsert), the no-driver-collect discipline
of the victim path, empty-victim merges committing as plain appends
(so the changelog's CoW guard stays meaningful), the partitioned
refusal, and changelog reconstruction over the destination's commits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.package import PackageBuilder
from cdf_spark.package.iceberg_dest import IcebergDestination
from cdf_spark.sources.base import WriteDisposition
from cdf_spark.sources.iceberg import IcebergTable


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _commit(spark, dest, builder, df, disposition):
    pkg = builder.build(admitted=df)
    rec = dest.verify(spark, dest.commit(spark, pkg, disposition), pkg)
    assert rec.verified
    return rec


def test_position_merge_matches_equality_result(spark, tmp_path, orders):
    expected = None
    for mode, sub in (("equality", "e"), ("position", "p")):
        dest = IcebergDestination(
            tmp_path / sub, merge_keys=["o_orderkey"], merge_mode=mode
        )
        b = PackageBuilder(tmp_path / f"pkgs_{sub}", "orders")
        _commit(spark, dest, b, orders.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
        batch = orders.filter("o_orderkey <= 400 or o_orderkey > 900").withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        _commit(spark, dest, b, batch, WriteDisposition.MERGE)
        got = sorted(
            (r.o_orderkey, r.o_totalprice) for r in dest.read(spark).collect()
        )
        if expected is None:
            expected = got
        else:
            assert got == expected  # byte-for-byte relational equivalence
    # and the position table's last commit really is positional
    t = IcebergTable(tmp_path / "p")
    sid = t.current_snapshot_id()
    assert t.delete_files_for_snapshot(sid)
    assert not t._eq_delete_entries(sid)


def test_position_merge_delete_then_reinsert(spark, tmp_path, orders):
    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 300"), WriteDisposition.APPEND)
    # batch 1 rewrites keys <= 100; batch 2 rewrites them AGAIN — the
    # second merge's victims live in batch 1's data files, so the
    # victim scan must resolve batch 1's own deletes first
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0)),
        WriteDisposition.MERGE,
    )
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-2.0)),
        WriteDisposition.MERGE,
    )
    got = dest.read(spark)
    assert got.count() == orders.filter("o_orderkey <= 300").count()
    assert got.filter("o_totalprice = -1.0").count() == 0
    assert (
        got.filter("o_totalprice = -2.0").count()
        == orders.filter("o_orderkey <= 100").count()
    )


def test_position_merge_no_driver_collect(spark, tmp_path, orders, monkeypatch):
    from pyspark.sql import DataFrame

    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 900"), WriteDisposition.APPEND)
    pkg = b.build(
        admitted=orders.filter("o_orderkey <= 200").withColumn(
            "o_totalprice", F.lit(-7.0)
        )
    )

    def _no_collect(self):
        raise AssertionError("driver-side collect() in the position MERGE path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    rec = dest.commit(spark, pkg, WriteDisposition.MERGE)
    monkeypatch.undo()
    assert dest.verify(spark, rec, pkg).verified
    got = dest.read(spark)
    assert got.filter("o_orderkey <= 200 and o_totalprice != -7.0").count() == 0


def test_position_merge_no_victims_commits_as_append(spark, tmp_path, orders):
    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    # all-new keys: the victim set is empty -> plain append commit, no
    # zero-row delete files, no 'overwrite' op for the changelog to trip on
    _commit(
        spark, dest, b, orders.filter("o_orderkey > 500"), WriteDisposition.MERGE
    )
    t = IcebergTable(tmp_path / "t")
    sid = t.current_snapshot_id()
    assert t.snapshot(sid)["summary"]["operation"] == "append"
    assert not t.delete_files_for_snapshot(sid)
    assert t.read(spark).count() == orders.count()


def test_position_merge_into_empty_table_is_insert(spark, tmp_path, orders):
    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 100"), WriteDisposition.MERGE)
    assert dest.read(spark).count() == orders.filter("o_orderkey <= 100").count()


def test_position_merge_partitioned_refuses(spark, tmp_path, orders):
    dest = IcebergDestination(
        tmp_path / "t",
        merge_keys=["o_orderkey"],
        merge_mode="position",
        partition_by=[("bucket", 4, "o_orderkey")],
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 500"), WriteDisposition.APPEND)
    pkg = b.build(
        admitted=orders.filter("o_orderkey <= 100").withColumn(
            "o_totalprice", F.lit(-1.0)
        )
    )
    with pytest.raises(ValueError, match="flat tables only"):
        dest.commit(spark, pkg, WriteDisposition.MERGE)


def test_position_merge_changelog_reconstructs(spark, tmp_path, orders):
    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 300"), WriteDisposition.APPEND)
    _commit(
        spark, dest, b,
        orders.filter("o_orderkey <= 100").withColumn("o_totalprice", F.lit(-1.0)),
        WriteDisposition.MERGE,
    )
    cl = IcebergTable(tmp_path / "t").changelog_scan(spark)
    by_type = {
        r._change_type: r.n
        for r in cl.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    n100 = orders.filter("o_orderkey <= 100").count()
    n300 = orders.filter("o_orderkey <= 300").count()
    assert by_type.get("delete", 0) == n100  # exact preimages
    assert by_type.get("insert", 0) == n300 + n100
    # delete preimages carry the PRE-merge values
    pre = cl.filter("_change_type = 'delete' and o_totalprice = -1.0").count()
    assert pre == 0


def test_position_merge_victim_scan_pruned_by_bounds(spark, tmp_path, orders, monkeypatch):
    """r10: the victim semi-join is a JOIN, so Catalyst cannot push the
    batch key range into the scan — manifest column bounds must prune
    files that provably cannot hold any batch key before the scan
    opens them (same discipline as the Hudi routing prune)."""
    dest = IcebergDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], merge_mode="position"
    )
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    # three appends -> three data files with disjoint key ranges
    for lo, hi in [(0, 400), (400, 800), (800, 1200)]:
        _commit(
            spark, dest, b,
            orders.filter(f"o_orderkey > {lo} and o_orderkey <= {hi}"),
            WriteDisposition.APPEND,
        )
    calls: list = []
    orig = IcebergTable.read

    def spy(self, spark_, *a, **kw):
        calls.append(kw.get("_files"))
        return orig(self, spark_, *a, **kw)

    monkeypatch.setattr(IcebergTable, "read", spy)
    batch = orders.filter("o_orderkey > 500 and o_orderkey <= 600").withColumn(
        "o_totalprice", F.lit(-5.0)
    )
    _commit(spark, dest, b, batch, WriteDisposition.MERGE)
    keep_meta_calls = [c for c in calls if c is not None]
    assert keep_meta_calls, "victim scan was not file-pruned"
    assert len(keep_meta_calls[0]) == 1  # only the overlapping file opened
    got = dest.read(spark)
    assert got.filter("o_totalprice = -5.0").count() == batch.count()
    assert got.count() == orders.filter("o_orderkey > 0 and o_orderkey <= 1200").count()
