"""Round-6 regression tests for the correctness defects flagged by the
round-5 review (ADVICE.md):

1. manifest-list partition-summary pruning must index each identity
   field by its position in the FULL spec field list (a bucket
   transform ahead of an identity field must not shift the lookup),
   and manifests written under a non-default spec must not be
   summary-pruned at all;
2. hive partition values that merely LOOK numeric ('01234' on a string
   column) must not cause wrong pruning — cross-type eq/ne is
   undecidable, the partition is kept and the residual filter decides;
3. Iceberg equality deletes treat NULL as equal — null-keyed delete
   rows must kill null-keyed data rows (null-unsafe joins let them
   resurrect);
4. metadata-only identity DATE/TIMESTAMP partition columns are stored
   as days/micros ints and must reconstitute as real dates/timestamps,
   not nulls (int->date cast is invalid in Spark) or second-scaled
   garbage;
5. Delta checkpoint parquet must carry metaData.schemaString and
   add.partitionValues/modificationTime/dataChange so real Delta
   readers can read a log-cleaned table.
"""

import datetime
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cdf_spark.expressions.ast import Col, Lit
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources.avro_format import decode_container, write_container
from cdf_spark.sources.iceberg import (
    _MANIFEST_LIST_SCHEMA,
    IcebergFixtureWriter,
    IcebergTable,
)

IDS = [7_000_000_000_000_000_101, 142, 5_000_000_000_000_000_103]


def _latest_metadata_path(root: Path) -> Path:
    hint = (root / "metadata" / "version-hint.text").read_text().strip()
    return root / "metadata" / f"v{hint}.metadata.json"


def _rewrite_manifest_lists(root: Path, mutate_row) -> None:
    """Apply `mutate_row(row)` to every manifest-list row of every
    snapshot and rewrite the avro container in place."""
    meta = json.loads(_latest_metadata_path(root).read_text())
    for s in meta.get("snapshots", []):
        p = Path(s["manifest-list"].replace("file://", ""))
        _, rows = decode_container(p.read_bytes())
        for r in rows:
            r.setdefault("partitions", None)
            mutate_row(r)
        p.write_bytes(write_container(_MANIFEST_LIST_SCHEMA, rows))


def test_summary_prune_with_leading_bucket_transform(spark, tmp_path, orders):
    """A non-identity (bucket) field FIRST in the spec shifts every
    summary position by one: the identity field's summary is
    summaries[1], not summaries[0]. Zipping the identity-only field
    list against the summaries pairs o_orderstatus with the bucket
    summary — here poisoned so a positional zip would prune EVERY
    manifest and silently lose all rows."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=61, partition_by=["o_orderstatus"])
    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    w.append(o.filter(F.col("o_orderstatus") == "F"), timestamp_ms=1000, snapshot_id=IDS[0])
    w.append(o.filter(F.col("o_orderstatus") == "O"), timestamp_ms=2000, snapshot_id=IDS[1])

    root = tmp_path / "t"
    mp = _latest_metadata_path(root)
    meta = json.loads(mp.read_text())
    spec = meta["partition-specs"][0]
    okey_id = next(
        f["id"]
        for f in meta["schemas"][0]["fields"]
        if f["name"] == "o_orderkey"
    )
    spec["fields"] = [
        {
            "name": "o_orderkey_bucket",
            "transform": "bucket[4]",
            "source-id": okey_id,
            "field-id": 1001,
        }
    ] + spec["fields"]
    mp.write_text(json.dumps(meta))

    # prepend the bucket field's summary; bounds are poison — decoded
    # as the STRING type of o_orderstatus they exclude every predicate
    def poison(row):
        if row.get("partitions"):
            row["partitions"] = [
                {"contains_null": False, "lower_bound": b"zz", "upper_bound": b"zz"}
            ] + row["partitions"]

    _rewrite_manifest_lists(root, poison)

    t = IcebergTable(root)
    df, plan = t.scan(
        spark, ScanRequest("ice", predicates=[Col("o_orderstatus") == Lit("F")])
    )
    m = plan.partitions.meta
    # the O manifest is still skipped from its REAL summary (position
    # 1); the F manifest survives the poison at position 0
    assert m["manifests_total"] == 2
    assert m["manifests_skipped"] == 1
    assert df.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_summary_prune_skipped_for_non_default_spec(spark, tmp_path, orders):
    """Manifests whose partition_spec_id is not the default spec carry
    summaries positional over a DIFFERENT field list — they must not be
    summary-pruned (misaligned bounds could decode as the wrong field
    and skip live rows). Entry-level pruning still applies."""
    w = IcebergFixtureWriter(tmp_path / "t", seed=62, partition_by=["o_orderstatus"])
    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    w.append(o.filter(F.col("o_orderstatus") == "F"), timestamp_ms=1000, snapshot_id=IDS[0])
    w.append(o.filter(F.col("o_orderstatus") == "O"), timestamp_ms=2000, snapshot_id=IDS[1])

    def foreign_spec(row):
        row["partition_spec_id"] = 5

    _rewrite_manifest_lists(tmp_path / "t", foreign_spec)

    t = IcebergTable(tmp_path / "t")
    df, plan = t.scan(
        spark, ScanRequest("ice", predicates=[Col("o_orderstatus") == Lit("F")])
    )
    m = plan.partitions.meta
    assert m["manifests_skipped"] == 0  # guard: no summary pruning at all
    # per-entry partition records still prune the O files
    assert m["files_pruned"] > 0
    assert df.count() == o.filter(F.col("o_orderstatus") == "F").count()


def test_hudi_numeric_shaped_string_partition_not_pruned(spark, tmp_path):
    """String partition values like '01234' coerce to int 1234 for
    pruning; a predicate against the string literal must keep the
    partition (undecidable), not prune it — int(1234) == '01234' is
    False in Python and used to silently drop the rows."""
    from cdf_spark.sources.hudi import HudiFixtureWriter, HudiTable

    df = spark.createDataFrame(
        [("01234", 1), ("01234", 2), ("05678", 3)], "code string, v int"
    )
    w = HudiFixtureWriter(tmp_path / "h", partition_by=["code"])
    w.commit(df)

    t = HudiTable(tmp_path / "h")
    got, _plan = t.scan(spark, ScanRequest("hudi", predicates=[Col("code") == Lit("01234")]))
    assert sorted(r.v for r in got.collect()) == [1, 2]


def test_equality_delete_null_key_kills_null_rows(spark, tmp_path):
    """Iceberg spec: equality deletes match NULL as equal. A delete row
    with k=NULL must remove the null-keyed data rows — a null-unsafe
    join would never match them and they'd resurrect on read."""
    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3), ("b", 4)], "k string, v int"
    )
    w = IcebergFixtureWriter(tmp_path / "t", seed=63)
    w.append(df, timestamp_ms=1000, snapshot_id=IDS[0])
    w.delete_equality(
        [{"k": None}, {"k": "b"}], ["k"], timestamp_ms=2000, snapshot_id=IDS[1]
    )

    t = IcebergTable(tmp_path / "t")
    assert sorted(r.v for r in t.read(spark).collect()) == [1]


def test_metadata_only_date_partition_reconstitutes(spark, tmp_path):
    """omit_partition_cols with a DATE partition column: the value
    rides in the manifest partition record as days-since-epoch; the
    read must rebuild a real date column (Spark's int->date cast is
    invalid -> the old path yielded nulls)."""
    d1, d2 = datetime.date(2024, 3, 1), datetime.date(2024, 7, 15)
    df = spark.createDataFrame([(d1, 1), (d1, 2), (d2, 3)], "dt date, v int")
    w = IcebergFixtureWriter(
        tmp_path / "t", seed=64, partition_by=["dt"], omit_partition_cols=True
    )
    w.append(df, timestamp_ms=1000, snapshot_id=IDS[0])

    t = IcebergTable(tmp_path / "t")
    # physical files lack the column
    raw = spark.read.parquet(t.files_for_snapshot(IDS[0])[0])
    assert "dt" not in raw.columns
    got = {(r.dt, r.v) for r in t.read(spark).collect()}
    assert got == {(d1, 1), (d1, 2), (d2, 3)}


def test_iceberg_merge_no_driver_key_collect(spark, tmp_path, orders, monkeypatch):
    """The MERGE commit path must never move key rows through the
    driver (a 100M-row CDC batch with mostly-unique keys would OOM
    control): the equality-delete key file is written distributively
    and registered from its footer. Falsified by making ANY
    DataFrame.collect() during commit raise."""
    from pyspark.sql import DataFrame

    from cdf_spark.package.builder import PackageBuilder
    from cdf_spark.package.iceberg_dest import IcebergDestination
    from cdf_spark.sources.base import WriteDisposition

    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    dest = IcebergDestination(tmp_path / "t", merge_keys=["o_orderkey"])
    builder = PackageBuilder(tmp_path / "pkgs", "orders")
    base = o.filter(F.col("o_orderkey") <= 900)
    pkg = builder.build(admitted=base)
    dest.commit(spark, pkg, WriteDisposition.APPEND)

    batch = o.filter(F.col("o_orderkey") <= 400).withColumn("o_totalprice", F.lit(-1.0))
    pkg2 = builder.build(admitted=batch)

    def _no_collect(self):
        raise AssertionError("driver-side collect() in the MERGE commit path")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    rec = dest.commit(spark, pkg2, WriteDisposition.MERGE)
    monkeypatch.undo()

    assert dest.verify(spark, rec, pkg2).verified
    got = dest.read(spark)
    # every key <= 400 carries the batch's value; older versions gone
    assert (
        got.filter((F.col("o_orderkey") <= 400) & (F.col("o_totalprice") != -1.0)).count()
        == 0
    )
    assert got.count() == base.count()


def test_delta_checkpoint_carries_schema_and_add_fields(spark, tmp_path):
    """Checkpoint parquet must be readable by real Delta readers:
    metaData.schemaString present and carried from the log, add rows
    with partitionValues/modificationTime/dataChange."""
    import pyarrow.parquet as pq

    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    w = DeltaFixtureWriter(tmp_path / "d")
    w.append(df)
    w.append(df)
    v = w.checkpoint()

    ck = tmp_path / "d" / "_delta_log" / f"{v:020d}.checkpoint.parquet"
    rows = pq.read_table(ck).to_pylist()
    metas = [r["metaData"] for r in rows if r.get("metaData")]
    assert len(metas) == 1
    assert metas[0]["schemaString"]  # non-empty, carried from the log
    assert metas[0]["partitionColumns"] == []
    adds = [r["add"] for r in rows if r.get("add")]
    assert adds, "checkpoint must list live files"
    for a in adds:
        assert a["modificationTime"] > 0
        assert a["dataChange"] is False
        assert a["partitionValues"] == []  # empty map round-trips as []
    # the table still replays identically from the checkpoint alone
    w.clean_log(v)
    t = DeltaTable(tmp_path / "d")
    assert t.read(spark).count() == 4  # two appends of 2 rows


def test_partition_cardinality_guard(spark, tmp_path):
    """A degenerate partition key (unique per row) must fail LOUDLY at
    commit time — O(partitions) commit metadata from a
    timestamp-grained key is an operational incident, not a table. The
    write is one distributed job and the driver only ever walks
    directory names, so the guard is the last line, not a memory
    band-aid."""
    from cdf_spark.sources.iceberg import IcebergFixtureWriter
    from cdf_spark.sources.partitioned_write import PartitionCardinalityError

    df = spark.range(0, 40).withColumn("k", F.col("id").cast("string"))
    w = IcebergFixtureWriter(
        tmp_path / "t", seed=65, partition_by=["k"], max_partitions_per_commit=10
    )
    with pytest.raises(PartitionCardinalityError, match="max_partitions"):
        w.append(df)

    # under the cap the same commit lands, with typed partition records
    w2 = IcebergFixtureWriter(
        tmp_path / "t2", seed=66, partition_by=["k"], max_partitions_per_commit=100
    )
    w2.append(df)
    from cdf_spark.sources.iceberg import IcebergTable

    assert IcebergTable(tmp_path / "t2").read(spark).count() == 40


def test_hudi_partition_guard(spark, tmp_path):
    from cdf_spark.sources.hudi import HudiFixtureWriter
    from cdf_spark.sources.partitioned_write import PartitionCardinalityError

    df = spark.range(0, 30).withColumn("k", F.col("id").cast("string"))
    w = HudiFixtureWriter(tmp_path / "h", partition_by=["k"], max_partitions_per_commit=5)
    with pytest.raises(PartitionCardinalityError):
        w.commit(df)


def test_write_avro_row_cap_fires(spark):
    """The jar-free Avro writer is a driver-side fixture path, not a
    bulk exporter: above max_rows it must refuse, pointing at the
    parquet path."""
    from cdf_spark.sources.avro_format import write_avro

    df = spark.range(0, 100)
    with pytest.raises(ValueError, match="capped at 10 rows"):
        write_avro(df, "/tmp/_nope.avro", max_rows=10)


def test_footer_stats_decimal_and_timestamp_exact(spark, tmp_path):
    """The footer-harvested evidence path must match the old
    aggregation semantics exactly: decimals (physical-form footer
    stats would fold wrongly) route through the distributed
    completion; timestamps (INT64 micros since the INT96 retirement)
    come straight from footers; values and renderings are identical
    to an aggregation over the data."""
    import datetime
    import json as _json
    from decimal import Decimal

    from cdf_spark.package.builder import PackageBuilder

    df = spark.createDataFrame(
        [
            (1, Decimal("10.50"), datetime.datetime(2024, 3, 1, 10, 30), "aa"),
            (2, Decimal("-3.25"), datetime.datetime(2024, 7, 1, 12, 0), None),
            (3, None, None, "zz"),
        ],
        "id long, amt decimal(10,2), ts timestamp, s string",
    )
    pkg = PackageBuilder(tmp_path, "dec").build(admitted=df)
    st = _json.loads((tmp_path / pkg.package_id / "stats" / "column_stats.json").read_text())
    assert st["id"] == {"null_count": 0, "complete": True, "min": 1, "max": 3}
    assert st["amt"]["min"] == "-3.25" and st["amt"]["max"] == "10.50"
    assert st["amt"]["null_count"] == 1
    assert st["ts"]["min"] == "2024-03-01 10:30:00"
    assert st["ts"]["max"] == "2024-07-01 12:00:00"
    assert st["s"] == {"null_count": 1, "complete": True, "min": "aa", "max": "zz"}
    assert st["__table"]["rows"] == 3
