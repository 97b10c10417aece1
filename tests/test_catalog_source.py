"""Glue-shaped catalog source: classification, type mapping, manifest
partition pruning, hive single-scan execution, iceberg routing.

Reference parity: `crates/cdf-source-glue/src/model.rs:89-232`
(classify_table decision order), `planner.rs:30-120` (partition
predicate pushdown into the manifest)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdf_spark.expressions.ast import Col
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources.base import ResourceDescriptor
from cdf_spark.sources.catalog import (
    CatalogError,
    CatalogPartition,
    CatalogTable,
    CatalogTableResource,
    ColumnSpec,
    FileCatalog,
    StorageDescriptor,
    TableClass,
    catalog_from_hive_layout,
    catalog_type_to_spark,
    classify_table,
)


def _tbl(**kw) -> CatalogTable:
    base = dict(name="t", storage=StorageDescriptor(location="/tmp/x"))
    base.update(kw)
    return CatalogTable(**base)


# -- classification (model.rs:106-232 decision order) -----------------------


def test_classify_view_and_federated():
    assert classify_table(_tbl(table_type="VIRTUAL_VIEW"))[0] is TableClass.VIEW
    assert classify_table(_tbl(view_text="SELECT 1"))[0] is TableClass.VIEW
    assert classify_table(_tbl(target_table="other_catalog.t"))[0] is TableClass.FEDERATED


def test_classify_table_formats_win_over_serde():
    assert classify_table(_tbl(parameters={"table_type": "ICEBERG"}))[0] is TableClass.ICEBERG
    assert classify_table(_tbl(parameters={"classification": "delta"}))[0] is TableClass.DELTA
    assert classify_table(_tbl(parameters={"Classification": "Hudi"}))[0] is TableClass.HUDI


def test_classify_stream_and_jdbc_serdes():
    sd = StorageDescriptor(location="x", input_format="com.amazon.kinesis.KinesisInputFormat")
    assert classify_table(_tbl(storage=sd))[0] is TableClass.STREAM
    sd = StorageDescriptor(location="x", serde_library="org.apache.hive.jdbc.JdbcSerde")
    assert classify_table(_tbl(storage=sd))[0] is TableClass.FEDERATED


def test_classify_conventional_formats():
    sd = StorageDescriptor(location="x", input_format="...MapredParquetInputFormat")
    cls, fmt, _ = classify_table(_tbl(storage=sd))
    assert (cls, fmt) == (TableClass.CONVENTIONAL, "parquet")
    cls, fmt, _ = classify_table(_tbl(parameters={"classification": "avro"}))
    assert (cls, fmt) == (TableClass.CONVENTIONAL, "avro_ocf")
    cls, fmt, _ = classify_table(_tbl(parameters={"classification": "json"}))
    assert (cls, fmt) == (TableClass.CONVENTIONAL, "ndjson")


def test_classify_csv_serde_parameter_translation():
    sd = StorageDescriptor(
        location="x",
        serde_library="org.apache.hadoop.hive.serde2.OpenCSVSerde",
        serde_parameters={"separatorChar": "|", "quoteChar": "'"},
    )
    cls, fmt, opts = classify_table(
        _tbl(storage=sd, parameters={"skip.header.line.count": "1"})
    )
    assert (cls, fmt) == (TableClass.CONVENTIONAL, "csv")
    assert opts == {"delimiter": "|", "quote": "'", "header": True}


def test_classify_csv_multiline_header_rejected():
    sd = StorageDescriptor(location="x", serde_library="...OpenCSVSerde")
    with pytest.raises(CatalogError, match="exactly one header"):
        classify_table(_tbl(storage=sd, parameters={"skip.header.line.count": "2"}))


def test_classify_unsupported_serde_reports_library():
    sd = StorageDescriptor(location="x", serde_library="com.example.WeirdSerde")
    cls, _, opts = classify_table(_tbl(storage=sd))
    assert cls is TableClass.UNSUPPORTED
    assert opts["serde"] == "com.example.WeirdSerde"


def test_override_format_beats_serde_mapping():
    sd = StorageDescriptor(location="x", serde_library="com.example.WeirdSerde")
    cls, fmt, _ = classify_table(_tbl(storage=sd), override_format="parquet")
    assert (cls, fmt) == (TableClass.CONVENTIONAL, "parquet")


# -- type strings ------------------------------------------------------------


def test_catalog_type_mapping():
    assert catalog_type_to_spark("bigint") == T.LongType()
    assert catalog_type_to_spark("decimal(12,2)") == T.DecimalType(12, 2)
    assert catalog_type_to_spark("array<double>") == T.ArrayType(T.DoubleType())
    assert catalog_type_to_spark("VARCHAR(64)") == T.StringType()
    with pytest.raises(CatalogError):
        catalog_type_to_spark("interval")


# -- partition pruning + execution ------------------------------------------


@pytest.fixture(scope="module")
def hive_orders(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("cat") / "orders"
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("status", F.col("o_orderstatus"))
        .write.partitionBy("status")
        .parquet(str(root))
    )
    cat = catalog_from_hive_layout(
        "lake",
        "orders",
        root,
        partition_keys=[("status", "string")],
    )
    return root, cat


def test_partition_pruning_prunes_manifest(spark, hive_orders):
    _, cat = hive_orders
    res = CatalogTableResource(ResourceDescriptor(resource_id="orders"), cat, "lake", "orders")
    plan = res.negotiate(
        ScanRequest("orders", projection=["o_orderkey", "status"], predicates=[Col("status") == "F"])
    )
    meta = plan.partitions.meta
    assert meta["partitions_total"] == 3
    assert meta["partitions_scanned"] == 1
    assert plan.partitions.units[0]["values"] == ["F"]
    # the partition predicate is recorded as EXACT pushdown
    assert any(p.fidelity.value == "exact" for p in plan.pushed)


def test_pruned_scan_matches_direct_read(spark, sf_dir, hive_orders):
    _, cat = hive_orders
    res = CatalogTableResource(ResourceDescriptor(resource_id="orders"), cat, "lake", "orders")
    df, plan = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey", "o_custkey", "status"],
            predicates=[Col("status") == "F", Col("o_custkey") < 500],
        ),
    )
    expect = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_custkey") < 500))
        .count()
    )
    assert df.count() == expect
    assert set(df.columns) == {"o_orderkey", "o_custkey", "status"}


def test_non_partition_predicate_keeps_all_partitions(spark, hive_orders):
    _, cat = hive_orders
    res = CatalogTableResource(ResourceDescriptor(resource_id="orders"), cat, "lake", "orders")
    plan = res.negotiate(ScanRequest("orders", predicates=[Col("o_custkey") < 10]))
    assert plan.partitions.meta["partitions_scanned"] == 3


def test_range_pruning_on_int_partition(spark, tmp_path):
    root = tmp_path / "ev"
    df = spark.range(100).withColumn("year", (F.col("id") % 4 + 2020).cast("int"))
    df.write.partitionBy("year").parquet(str(root))
    cat = catalog_from_hive_layout("lake", "ev", root, partition_keys=[("year", "int")])
    res = CatalogTableResource(ResourceDescriptor(resource_id="ev"), cat, "lake", "ev")
    out, plan = res.scan(spark, ScanRequest("ev", predicates=[Col("year") >= 2022]))
    assert plan.partitions.meta["partitions_scanned"] == 2
    assert out.count() == 50
    assert out.agg(F.min("year")).first()[0] == 2022


def test_non_hive_locations_union_with_literal_columns(spark, tmp_path):
    """Arbitrary partition locations (no key=value layout) still scan:
    per-partition union, values attached from the catalog."""
    locs = []
    for i, region in enumerate(["emea", "apac"]):
        p = tmp_path / f"blob{i}"
        spark.range(10).withColumn("v", F.col("id") * (i + 1)).write.parquet(str(p))
        locs.append((region, str(p)))
    tbl = CatalogTable(
        name="t",
        database="lake",
        parameters={"classification": "parquet"},
        storage=StorageDescriptor(location=str(tmp_path)),
        partition_keys=[ColumnSpec("region", "string")],
        partitions=[CatalogPartition(values=[r], location=loc) for r, loc in locs],
    )
    cat = FileCatalog({("lake", "t"): tbl})
    res = CatalogTableResource(ResourceDescriptor(resource_id="t"), cat, "lake", "t")
    df, plan = res.scan(spark, ScanRequest("t", predicates=[Col("region") == "apac"]))
    assert plan.partitions.meta["partitions_scanned"] == 1
    assert df.count() == 10
    assert df.select("region").distinct().first()[0] == "apac"


def test_unscannable_classes_raise(spark):
    sd = StorageDescriptor(location="x", input_format="kinesis")
    cat = FileCatalog({("lake", "s"): _tbl(name="s", database="lake", storage=sd)})
    res = CatalogTableResource(ResourceDescriptor(resource_id="s"), cat, "lake", "s")
    with pytest.raises(CatalogError, match="stream"):
        res.negotiate(ScanRequest("s"))


def test_iceberg_class_routes_to_snapshot_table(spark, tmp_path):
    from cdf_spark.sources.snapshot_table import SnapshotTable

    root = tmp_path / "snap"
    st = SnapshotTable(root)
    st.append(spark.range(5).withColumn("v", F.lit("a")))
    tbl = CatalogTable(
        name="snap",
        database="lake",
        parameters={"table_type": "iceberg"},
        storage=StorageDescriptor(location=str(root)),
    )
    cat = FileCatalog({("lake", "snap"): tbl})
    res = CatalogTableResource(ResourceDescriptor(resource_id="snap"), cat, "lake", "snap")
    assert res.table_class is TableClass.ICEBERG
    src = res.snapshot_source()
    assert src.current_snapshot_id() is not None
    assert src.read(spark).count() == 5


def test_catalog_json_load_round_trip(tmp_path):
    doc = {
        "databases": {
            "lake": {
                "tables": {
                    "t": {
                        "table_type": "EXTERNAL_TABLE",
                        "parameters": {"classification": "parquet"},
                        "storage": {"location": "/data/t"},
                        "columns": [{"name": "a", "type": "bigint"}],
                        "partition_keys": [{"name": "ds", "type": "date"}],
                        "partitions": [
                            {"values": ["2026-01-01"], "location": "/data/t/ds=2026-01-01"}
                        ],
                        "version_id": "7",
                    }
                }
            }
        }
    }
    p = tmp_path / "catalog.json"
    p.write_text(json.dumps(doc))
    cat = FileCatalog.load(p)
    t = cat.get_table("lake", "t")
    assert t.generation() == "catalog-version:7"
    assert t.partition_keys[0].type == "date"
    assert cat.list_tables("lake") == ["t"]
    with pytest.raises(CatalogError):
        cat.get_table("lake", "missing")


def test_catalog_scan_routes_snapshot_formats(spark, tmp_path, orders):
    """CatalogTableResource.scan on an iceberg-classified REAL layout
    must resolve through the Iceberg reader — merge-on-read equality
    deletes applied, pruning evidence attached. A plain location read
    (the pre-fix behavior) would also scan the delete file and the
    deleted rows would resurrect."""
    from pyspark.sql import functions as F

    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.sources.iceberg import IcebergFixtureWriter

    w = IcebergFixtureWriter(tmp_path / "ice", seed=52)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.filter(F.col("o_orderkey") <= 60), timestamp_ms=1000)
    w.delete_equality([{"o_orderkey": 7}], ["o_orderkey"], timestamp_ms=2000)

    cat = FileCatalog(
        {
            ("lake", "orders_ice"): CatalogTable(
                name="orders_ice",
                database="lake",
                table_type="EXTERNAL_TABLE",
                parameters={"table_type": "ICEBERG"},
                storage=StorageDescriptor(location=str(tmp_path / "ice")),
            )
        }
    )
    res = CatalogTableResource(
        ResourceDescriptor(resource_id="orders_ice"), cat, "lake", "orders_ice"
    )
    df, plan = res.scan(
        spark, ScanRequest("orders_ice", predicates=[Col("o_orderkey") <= Lit(60)])
    )
    assert df.filter(F.col("o_orderkey") == 7).count() == 0  # delete applied
    assert df.count() == o.filter(F.col("o_orderkey") <= 60).count() - 1
    assert plan.partitions is not None  # format reader's pruning evidence
    # executing a bare plan on a snapshot class refuses loudly
    import pytest as _pytest

    with _pytest.raises(CatalogError, match="scan\\(\\)/snapshot_source"):
        res.execute(spark, plan)
