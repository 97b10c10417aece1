"""Delta destination: commit -> verify protocol landing a real
`_delta_log` table (open-format sibling of IcebergDestination; MERGE
is honest copy-on-write — no deletion vectors are written)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.package import PackageBuilder
from cdf_spark.package.delta_dest import DeltaDestination
from cdf_spark.sources.base import WriteDisposition
from cdf_spark.sources.delta import DeltaTable


def test_append_replace_and_time_travel(spark, tmp_path, orders):
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    dest = DeltaDestination(tmp_path / "t")
    builder = PackageBuilder(tmp_path / "pkgs", "orders")

    pkg = builder.build(admitted=o.limit(100))
    assert dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg).verified
    pkg2 = builder.build(admitted=o.offset(100).limit(50))
    assert dest.verify(spark, dest.commit(spark, pkg2, WriteDisposition.APPEND), pkg2).verified
    assert dest.read(spark).count() == 150

    assert dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.REPLACE), pkg).verified
    t = DeltaTable(tmp_path / "t")
    assert t.read(spark).count() == 100
    assert t.read(spark, version=1).count() == 150  # pre-replace pin intact
    assert t.current_version() == 2  # per-run instances share one log


def test_merge_is_merge_on_read_no_rewrite(spark, tmp_path, orders):
    """MERGE must NOT rewrite untouched data: the base commit's data
    files stay live (re-added with DV descriptors where rows matched),
    only the batch's segments are new bytes, and compact() later
    resolves the DVs into a clean rewrite."""
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    dest = DeltaDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    builder = PackageBuilder(tmp_path / "pkgs", "orders")
    base = o.filter(F.col("o_orderkey") <= 900)
    pkg = builder.build(admitted=base)
    assert dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg).verified
    t0 = DeltaTable(tmp_path / "t")
    base_files = set(t0.files_for_version(t0.current_version()))

    batch = o.filter(F.col("o_orderkey") <= 400).withColumn("o_totalprice", F.lit(-1.0))
    pkg2 = builder.build(admitted=batch)
    assert dest.verify(spark, dest.commit(spark, pkg2, WriteDisposition.MERGE), pkg2).verified

    t1 = DeltaTable(tmp_path / "t")
    pairs = t1.live_files_with_dvs(t1.current_version())
    live = {f for f, _ in pairs}
    # every base file is STILL live (no rewrite) and the matched ones
    # carry deletion vectors
    assert base_files <= live
    assert any(dv for f, dv in pairs if f in base_files)
    cur = dest.read(spark)
    assert cur.count() == base.count()
    assert cur.filter((F.col("o_orderkey") <= 400) & (F.col("o_totalprice") != -1.0)).count() == 0

    # compact resolves the DVs into a clean rewrite with identical rows
    n = cur.count()
    dest.compact(spark, target_files=2)
    t2 = DeltaTable(tmp_path / "t")
    assert not any(dv for _f, dv in t2.live_files_with_dvs(t2.current_version()))
    assert dest.read(spark).count() == n


def test_merge_copy_on_write(spark, tmp_path, orders):
    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    dest = DeltaDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    builder = PackageBuilder(tmp_path / "pkgs", "orders")

    base = o.filter(F.col("o_orderkey") <= 900)
    pkg = builder.build(admitted=base)
    assert dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg).verified

    batch = (
        o.filter((F.col("o_orderkey") <= 400) | (F.col("o_orderkey") > 900))
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    pkg2 = builder.build(admitted=batch)
    assert dest.verify(spark, dest.commit(spark, pkg2, WriteDisposition.MERGE), pkg2).verified

    cur = dest.read(spark)
    expect = base.count() - base.filter(F.col("o_orderkey") <= 400).count() + batch.count()
    assert cur.count() == expect
    updated = cur.filter(F.col("o_orderkey") <= 400)
    assert updated.filter(F.col("o_totalprice") != -1.0).count() == 0
    assert updated.groupBy("o_orderkey").count().filter(F.col("count") > 1).count() == 0

    # idempotent replay
    assert dest.verify(spark, dest.commit(spark, pkg2, WriteDisposition.MERGE), pkg2).verified
    assert dest.read(spark).count() == expect


def test_merge_requires_keys(spark, tmp_path, orders):
    dest = DeltaDestination(tmp_path / "t")
    pkg = PackageBuilder(tmp_path / "pkgs", "o").build(
        admitted=orders.select("o_orderkey").limit(5)
    )
    with pytest.raises(ValueError, match="merge_keys"):
        dest.commit(spark, pkg, WriteDisposition.MERGE)


def test_multiwriter_race_retries_to_serial_result(spark, tmp_path, orders):
    """Two concurrent Delta committers race: the numbered commit JSON
    is the CAS token (O_EXCL), the loser rehydrates and retries, and
    the final log is linear with both commits present."""
    import threading

    from pyspark.sql import functions as F

    from cdf_spark.package import PackageBuilder
    from cdf_spark.package.delta_dest import DeltaDestination
    from cdf_spark.sources.base import WriteDisposition
    from cdf_spark.sources.delta import DeltaTable

    o = orders.select("o_orderkey", "o_totalprice")
    dest = DeltaDestination(tmp_path / "t")
    builder = PackageBuilder(tmp_path / "pkgs", "orders")
    base = builder.build(admitted=o.filter(F.col("o_orderkey") <= 500))
    dest.commit(spark, base, WriteDisposition.APPEND)

    pkg_a = builder.build(admitted=o.filter((F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 700)))
    pkg_b = builder.build(admitted=o.filter(F.col("o_orderkey") > 700))
    errors = []
    barrier = threading.Barrier(2)

    def commit(pkg):
        try:
            barrier.wait(timeout=30)
            DeltaDestination(tmp_path / "t").commit(spark, pkg, WriteDisposition.APPEND)
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    ta = threading.Thread(target=commit, args=(pkg_a,))
    tb = threading.Thread(target=commit, args=(pkg_b,))
    ta.start(); tb.start(); ta.join(60); tb.join(60)
    assert not errors, f"retry policy must absorb the race: {errors}"

    t = DeltaTable(tmp_path / "t")
    assert t.current_version() == 2  # linear: base + two serialized appends
    assert t.read(spark).count() == o.count()


def test_auto_checkpoint_and_compact(spark, tmp_path, orders):
    """The destination writes a checkpoint parquet every N commits
    (real-writer cadence) and compact() collapses small files into one
    replace commit that still reads identically."""
    from pyspark.sql import functions as F

    from cdf_spark.package import PackageBuilder
    from cdf_spark.package.delta_dest import DeltaDestination
    from cdf_spark.sources.base import WriteDisposition
    from cdf_spark.sources.delta import DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").limit(400)
    dest = DeltaDestination(tmp_path / "t", checkpoint_interval=2)
    builder = PackageBuilder(tmp_path / "pkgs", "orders")
    for i in range(3):
        pkg = builder.build(admitted=o.filter(F.col("o_orderkey") % 3 == i))
        dest.commit(spark, pkg, WriteDisposition.APPEND)
    cks = list((tmp_path / "t" / "_delta_log").glob("*.checkpoint.parquet"))
    assert cks, "interval checkpoints must be written"

    n = dest.read(spark).count()
    out = dest.compact(spark, target_files=1)
    assert out["files_after"] <= out["files_before"]
    assert dest.read(spark).count() == n


def test_partitioned_destination_keeps_pruning(spark, tmp_path, orders):
    """Commits into a partitioned Delta table route through the
    partition-splitting write (declared on a new table, rehydrated on
    an existing one), so adds carry partitionValues, pruning works
    after append/replace/merge, and the copy-on-write merge stays
    correct."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    dest = DeltaDestination(
        tmp_path / "t", merge_keys=["o_orderkey"], partition_by=["o_orderstatus"]
    )
    builder = PackageBuilder(tmp_path / "pkgs", "orders")
    base = o.filter(F.col("o_orderkey") <= 900)
    pkg = builder.build(admitted=base)
    assert dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg).verified

    batch = o.filter(F.col("o_orderkey") <= 300).withColumn("o_totalprice", F.lit(-1.0))
    pkg2 = builder.build(admitted=batch)
    # a FRESH destination instance (no partition_by declared) must
    # rehydrate the spec from the table's own metaData
    dest2 = DeltaDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    assert dest2.verify(spark, dest2.commit(spark, pkg2, WriteDisposition.MERGE), pkg2).verified

    t = DeltaTable(tmp_path / "t")
    cur = t.read(spark)
    assert cur.count() == base.count()
    assert cur.filter((F.col("o_orderkey") <= 300) & (F.col("o_totalprice") != -1.0)).count() == 0
    res, plan = t.scan(
        spark, ScanRequest("d", predicates=[Col("o_orderstatus") == Lit("F")])
    )
    assert plan.partitions.meta["files_pruned"] > 0
    assert res.count() == cur.filter("o_orderstatus = 'F'").count()
