"""Schema widening through the destination protocol (all 3 formats).

The oracled query `dest_schema_evolution_trio` proves the composed
narrow -> widened-MERGE path; these tests pin the per-format
mechanics and the refusal edges: widened APPEND as well as MERGE,
old rows null-filled, the Delta metaData schemaString actually
evolving (not just the files), type CHANGES refusing (widening only),
and configuration flags (CDF/constraints) surviving the widening
metaData rewrite.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cdf_spark.package import PackageBuilder
from cdf_spark.package.delta_dest import DeltaDestination
from cdf_spark.package.hudi_dest import HudiDestination
from cdf_spark.package.iceberg_dest import IcebergDestination
from cdf_spark.sources.base import WriteDisposition


@pytest.fixture()
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )


def _commit(spark, dest, builder, df, disposition):
    pkg = builder.build(admitted=df)
    rec = dest.verify(spark, dest.commit(spark, pkg, disposition), pkg)
    assert rec.verified
    return rec


@pytest.mark.parametrize("mk", [DeltaDestination, HudiDestination, IcebergDestination])
def test_widened_append_lands_column(spark, tmp_path, orders, mk):
    dest = mk(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 200"), WriteDisposition.APPEND)
    wide = orders.filter("o_orderkey > 200 and o_orderkey <= 400").withColumn(
        "o_note", F.lit("x")
    )
    _commit(spark, dest, b, wide, WriteDisposition.APPEND)
    got = dest.read(spark)
    assert "o_note" in got.columns
    assert got.count() == 401
    assert got.filter("o_note is null").count() == 201  # old rows null-fill
    assert got.filter("o_note = 'x'").count() == 200


@pytest.mark.parametrize("mk", [DeltaDestination, HudiDestination, IcebergDestination])
def test_widened_merge_from_narrow_table(spark, tmp_path, orders, mk):
    dest = mk(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 200"), WriteDisposition.APPEND)
    wide = (
        orders.filter("o_orderkey <= 100")
        .withColumn("o_totalprice", F.lit(-1.0))
        .withColumn("o_note", F.lit("m"))
    )
    _commit(spark, dest, b, wide, WriteDisposition.MERGE)
    got = dest.read(spark)
    assert "o_note" in got.columns
    assert got.count() == 201
    assert got.filter("o_note = 'm'").count() == 101
    assert got.filter("o_note is null").count() == 100


def test_delta_widening_evolves_metadata_schema(spark, tmp_path, orders):
    """The Delta defect class this guards: the declared schemaString
    (which drives every read) must evolve IN the data commit — data
    files alone are invisible."""
    from cdf_spark.sources.delta import DeltaTable

    dest = DeltaDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 100"), WriteDisposition.APPEND)
    t = DeltaTable(tmp_path / "t")
    v0 = t.current_version()
    fields0 = [
        f["name"]
        for f in json.loads(t.metadata_for_version(v0)["schemaString"])["fields"]
    ]
    assert "o_note" not in fields0
    wide = orders.filter("o_orderkey > 100 and o_orderkey <= 200").withColumn(
        "o_note", F.lit("x")
    )
    _commit(spark, dest, b, wide, WriteDisposition.APPEND)
    t2 = DeltaTable(tmp_path / "t")
    v1 = t2.current_version()
    assert v1 == v0 + 1  # ONE commit carries metaData + adds
    fields1 = [
        f["name"]
        for f in json.loads(t2.metadata_for_version(v1)["schemaString"])["fields"]
    ]
    assert "o_note" in fields1
    # time travel to v0 still reads the narrow schema
    assert "o_note" not in t2.read(spark, version=v0).columns


def test_delta_widening_preserves_configuration(spark, tmp_path, orders):
    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(orders.filter("o_orderkey <= 100"))
    seg = tmp_path / "seg"
    orders.filter("o_orderkey > 100 and o_orderkey <= 150").withColumn(
        "o_note", F.lit("x")
    ).coalesce(1).write.mode("overwrite").parquet(str(seg))
    files = sorted(str(p) for p in seg.glob("*.parquet"))
    w.append_files(files)
    t = DeltaTable(tmp_path / "t")
    conf = t.metadata_for_version(t.current_version())["configuration"]
    assert conf.get("delta.enableChangeDataFeed") == "true"  # flag survived
    assert "o_note" in t.read(spark).columns


def test_delta_type_change_refuses(spark, tmp_path, orders):
    from cdf_spark.sources.delta import DeltaError

    dest = DeltaDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    b = PackageBuilder(tmp_path / "pkgs", "orders")
    _commit(spark, dest, b, orders.filter("o_orderkey <= 100"), WriteDisposition.APPEND)
    retyped = orders.filter("o_orderkey > 100 and o_orderkey <= 200").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("string")
    )
    pkg = b.build(admitted=retyped)
    with pytest.raises(DeltaError):
        dest.commit(spark, pkg, WriteDisposition.APPEND)


def test_iceberg_type_promotion_and_refusal(spark, tmp_path):
    """Iceberg's only sanctioned in-place type evolutions: int->long
    and float->double PROMOTE the declared type when a wider file
    arrives; any other drift refuses (a landed file the declared
    schema can't losslessly read would silently truncate)."""
    from cdf_spark.sources.iceberg import IcebergError, IcebergFixtureWriter, IcebergTable

    narrow = spark.range(0, 100).selectExpr(
        "id AS k", "CAST(id AS INT) AS v", "CAST(id AS FLOAT) AS f"
    )
    w = IcebergFixtureWriter(tmp_path / "t", seed=99)
    w.append(narrow, timestamp_ms=1000)

    wide = spark.range(100, 200).selectExpr(
        "id AS k", "CAST(id * 10000000000 AS LONG) AS v", "CAST(id AS DOUBLE) AS f"
    )
    seg = tmp_path / "seg"
    wide.coalesce(1).write.mode("overwrite").parquet(str(seg))
    files = sorted(str(p) for p in seg.glob("*.parquet"))
    w.append_files(files, timestamp_ms=2000)

    got = IcebergTable(tmp_path / "t").read(spark)
    types = dict(got.dtypes)
    assert types["v"] == "bigint" and types["f"] == "double", types
    assert got.count() == 200
    # wide values survive (would truncate under the old declared int)
    assert got.filter("v > 2147483647").count() == 100
    # old narrow values intact
    assert got.filter("k < 100 and v = k").count() == 100

    bad = spark.range(0, 10).selectExpr("id AS k", "CAST(id AS STRING) AS v", "CAST(id AS DOUBLE) AS f")
    seg2 = tmp_path / "seg2"
    bad.coalesce(1).write.mode("overwrite").parquet(str(seg2))
    files2 = sorted(str(p) for p in seg2.glob("*.parquet"))
    with pytest.raises(IcebergError, match="not a sanctioned promotion"):
        w.append_files(files2, timestamp_ms=3000)
