"""Hudi copy-on-write reader: timeline replay, file-slice resolution
(latest version per file group), time travel, incremental consumption
with group-rewrite resets, and catalog routing."""

from __future__ import annotations

import pytest

from cdf_spark.positions import TableSnapshotPosition
from cdf_spark.sources.hudi import (
    HudiError,
    HudiFixtureWriter,
    HudiTable,
    is_hudi_layout,
)


@pytest.fixture()
def table(spark, tmp_path, orders):
    w = HudiFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.commit(o.limit(100))
    w.commit(o.offset(100).limit(50))
    return w, HudiTable(tmp_path / "t")


def test_layout_detection_and_mor_rejection(table, tmp_path):
    w, t = table
    assert is_hudi_layout(t.root)
    assert not is_hudi_layout(tmp_path)
    (t.hoodie / "x.deltacommit").write_text("{}")
    with pytest.raises(HudiError, match="merge-on-read"):
        HudiTable(t.root)


def test_snapshot_and_time_travel(spark, table):
    w, t = table
    i1, i2 = t.instants()
    assert t.read(spark, instant=i1).count() == 100
    assert t.read(spark).count() == 150
    assert t.read(spark, as_of_instant=i1).count() == 100


def test_copy_on_write_group_rewrite(spark, tmp_path, orders):
    """Rewriting a file group (UPSERT) supersedes its older version in
    every later snapshot while time travel still sees the old one."""
    from pyspark.sql import functions as F

    w = HudiFixtureWriter(tmp_path / "t2")
    o = orders.select("o_orderkey", "o_totalprice")
    w.commit(o.limit(100), file_id="grp1")
    i1 = HudiTable(tmp_path / "t2").latest_instant()
    # rewrite grp1 with updated totals (CoW update path)
    w.commit(o.limit(100).withColumn("o_totalprice", F.lit(0.0)), file_id="grp1")
    t = HudiTable(tmp_path / "t2")
    assert t.read(spark).count() == 100  # still one group, not 200 rows
    assert t.read(spark).agg(F.max("o_totalprice")).collect()[0][0] == 0.0
    assert t.read(spark, instant=i1).agg(F.max("o_totalprice")).collect()[0][0] > 0.0


def test_changes_since_insert_delta_and_rewrite_reset(spark, tmp_path, orders):
    w = HudiFixtureWriter(tmp_path / "t3")
    o = orders.select("o_orderkey", "o_totalprice")
    w.commit(o.limit(100), file_id="grp1")
    t = HudiTable(tmp_path / "t3")
    pos = t.position()
    # pure-insert commit -> delta only
    w.commit(o.offset(100).limit(40))
    t = HudiTable(tmp_path / "t3")
    df, pos2 = t.changes_since(spark, pos)
    assert df.count() == 40
    # group rewrite -> full re-read (previously-seen rows changed)
    w.commit(o.limit(100), file_id="grp1")
    t = HudiTable(tmp_path / "t3")
    df2, pos3 = t.changes_since(spark, pos2)
    assert df2.count() == 140  # full current snapshot
    # caught up
    df3, _ = t.changes_since(spark, pos3)
    assert df3 is None
    # position round-trips through the int snapshot_id encoding
    assert isinstance(pos3, TableSnapshotPosition)
    assert f"{pos3.snapshot_id:017d}" == t.latest_instant()


def test_catalog_routes_hudi_class(spark, table):
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.sources.catalog import (
        CatalogTable,
        CatalogTableResource,
        FileCatalog,
        StorageDescriptor,
    )

    w, t = table
    cat = FileCatalog(
        {
            ("lake", "orders_hudi"): CatalogTable(
                name="orders_hudi",
                database="lake",
                table_type="EXTERNAL_TABLE",
                parameters={"table_type": "HUDI"},
                storage=StorageDescriptor(location=str(t.root)),
            )
        }
    )
    src = CatalogTableResource(
        ResourceDescriptor(resource_id="orders_hudi"), cat, "lake", "orders_hudi"
    )
    reader = src.snapshot_source()
    assert isinstance(reader, HudiTable)
    assert reader.read(spark).count() == 150


def test_changes_since_new_group_rewritten_after_checkpoint(spark, tmp_path, orders):
    """A file group CREATED and then REWRITTEN by two commits both after
    the checkpoint was never delivered at v1 — only its latest version
    ships, not both (stale-row regression)."""
    from pyspark.sql import functions as F

    w = HudiFixtureWriter(tmp_path / "t4")
    o = orders.select("o_orderkey", "o_totalprice")
    w.commit(o.limit(100), file_id="grp1")
    t = HudiTable(tmp_path / "t4")
    pos = t.position()
    # after checkpoint: NEW group created, then rewritten (same fid)
    w.commit(o.offset(100).limit(40), file_id="grp2")
    w.commit(
        o.offset(100).limit(40).withColumn("o_totalprice", F.lit(-1.0)),
        file_id="grp2",
    )
    t = HudiTable(tmp_path / "t4")
    df, _ = t.changes_since(spark, pos)
    assert df.count() == 40  # NOT 80: v1 of grp2 must not be delivered
    assert df.agg(F.max("o_totalprice")).collect()[0][0] == -1.0


def test_catalog_negotiate_hudi_and_scan(spark, table):
    """negotiate() for a HUDI-classified table must reach
    HudiTable.capabilities(); HudiTable.scan applies the negotiated
    pushdown (same contract as Delta/Iceberg)."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.sources.catalog import (
        CatalogTable,
        CatalogTableResource,
        FileCatalog,
        StorageDescriptor,
    )

    w, t = table
    cat = FileCatalog(
        {
            ("lake", "orders_hudi"): CatalogTable(
                name="orders_hudi",
                database="lake",
                table_type="EXTERNAL_TABLE",
                parameters={"table_type": "HUDI"},
                storage=StorageDescriptor(location=str(t.root)),
            )
        }
    )
    src = CatalogTableResource(
        ResourceDescriptor(resource_id="orders_hudi"), cat, "lake", "orders_hudi"
    )
    req = ScanRequest(
        "orders_hudi",
        projection=["o_orderkey", "o_totalprice"],
        predicates=[Col("o_orderkey") <= Lit(50)],
    )
    plan = src.negotiate(req)  # must not AttributeError
    assert plan.projection == ["o_orderkey", "o_totalprice"]
    df, plan2 = t.scan(spark, req)
    assert df.columns == ["o_orderkey", "o_totalprice"]
    from pyspark.sql import functions as F

    assert df.filter(F.col("o_orderkey") > 50).count() == 0
    assert df.count() == t.read(spark).filter(F.col("o_orderkey") <= 50).count()


def test_partitioned_layout_and_path_pruning(spark, tmp_path, orders):
    """Hive-partitioned CoW layout: files land under col=value dirs,
    partitionToWriteStats is keyed by partition path, and a negotiated
    scan prunes whole partitions from the path values (tri-state —
    undecidable keeps the slice); a CoW rewrite inside one partition
    stays partition-local."""
    from pyspark.sql import functions as F

    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w = HudiFixtureWriter(tmp_path / "t", partition_by=["o_orderstatus"])
    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    w.commit(o, file_id="grp1")
    t = HudiTable(tmp_path / "t")
    # layout: one file per status under its partition dir
    slices = t.file_slices_for_instant(t.latest_instant())
    assert {p for p, _ in slices} == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
    assert all(f"/{part}/" in path for part, path in slices)

    df, plan = t.scan(
        spark, ScanRequest("h", predicates=[Col("o_orderstatus") == Lit("P")])
    )
    meta = plan.partitions.meta
    assert meta["files_total"] == 3 and meta["files_kept"] == 1
    assert df.count() == o.filter(F.col("o_orderstatus") == "P").count()

    # rewrite the P partition's group only: pruned scans see the new
    # version, other partitions untouched
    w.commit(
        o.filter(F.col("o_orderstatus") == "P").withColumn("o_totalprice", F.lit(-1.0)),
        file_id="grp1",
    )
    t2 = HudiTable(tmp_path / "t")
    df2, plan2 = t2.scan(
        spark, ScanRequest("h", predicates=[Col("o_orderstatus") == Lit("P")])
    )
    assert plan2.partitions.meta["files_kept"] == 1
    assert df2.agg(F.max("o_totalprice")).collect()[0][0] == -1.0
    assert t2.read(spark).count() == o.count()
    # numeric-shaped partition values coerce for pruning
    assert HudiTable._partition_values("y=2024/status=F") == {"y": 2024, "status": "F"}
