"""Hudi merge-on-read: log-block framing round-trips, bucket-index
routing, snapshot merge (upserts/deletes/precombine), time travel over
shared log files, incremental consumption, compaction supersession,
negotiated-scan pushdown honesty, and catalog routing."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from cdf_spark.positions import TableSnapshotPosition
from cdf_spark.sources.hudi import HudiError, HudiTable
from cdf_spark.sources.hudi_mor import (
    BLOCK_AVRO_DATA,
    BLOCK_DELETE,
    MAGIC,
    HudiMorFixtureWriter,
    HudiMorTable,
    decode_blocks,
    decode_data_block,
    decode_delete_block,
    encode_data_block,
    encode_delete_block,
)

SCHEMA = {
    "type": "record",
    "name": "HoodieRecord",
    "fields": [
        {"name": "k", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "double"]},
    ],
}


# -- log framing -----------------------------------------------------------


def test_block_roundtrip_and_framing():
    rows = [{"k": 1, "v": 1.5}, {"k": 2, "v": None}]
    raw = encode_data_block(SCHEMA, rows, "001") + encode_delete_block(
        [("7", ""), ("8", "")], "002"
    )
    assert raw.startswith(MAGIC)
    blocks = decode_blocks(raw)
    assert [b[0] for b in blocks] == [BLOCK_AVRO_DATA, BLOCK_DELETE]
    assert decode_data_block(blocks[0][1], blocks[0][2]) == rows
    assert [d["recordKey"] for d in decode_delete_block(blocks[1][2])] == ["7", "8"]


def test_corrupt_log_detected():
    raw = encode_data_block(SCHEMA, [{"k": 1, "v": 0.0}], "001")
    with pytest.raises(HudiError, match="bad magic"):
        decode_blocks(b"JUNK" + raw)
    with pytest.raises(HudiError, match="trailer"):
        decode_blocks(raw[:-8] + b"\x00" * 8)


# -- table fixture ---------------------------------------------------------


@pytest.fixture()
def mor(spark, tmp_path):
    df = spark.range(1, 41).select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", n_buckets=3)
    w.insert(df)
    return w, lambda: HudiMorTable(tmp_path / "t")


def test_bucket_routing_matches_spark_hash(mor):
    """Driver-side zlib.crc32 routing must equal the Spark-side
    pmod(crc32(...)) used at insert time, or upserts would land in the
    wrong file group and silently vanish from the merge."""
    w, t = mor
    for key in (1, 17, 40, 12345):
        spark_bucket = zlib.crc32(str(key).encode()) % w.n_buckets
        assert w._bucket_of(key) == spark_bucket


def test_snapshot_upsert_delete(spark, mor):
    w, mk = mor
    w.upsert(spark.range(10, 21).select(F.col("id").alias("k"), F.lit(-1.0).alias("v")))
    w.delete(spark.range(1, 6).select(F.col("id").alias("k")))
    snap = {r.k: r.v for r in mk().snapshot(spark).collect()}
    assert set(snap) == set(range(6, 41))
    assert all(snap[k] == -1.0 for k in range(10, 21))
    assert all(snap[k] == k * 10.0 for k in list(range(6, 10)) + list(range(21, 41)))


def test_read_optimized_ignores_logs(spark, mor):
    w, mk = mor
    w.upsert(spark.createDataFrame([(1, -1.0)], "k long, v double"))
    w.delete(spark.createDataFrame([(2,)], "k long"))
    ro = {r.k: r.v for r in mk().read_optimized(spark).collect()}
    assert ro[1] == 10.0 and 2 in ro  # pending log records invisible


def test_time_travel_shared_log_file(spark, mor):
    """Two upserts append blocks to the SAME log file; the pin at the
    first must not see the second's block."""
    w, mk = mor
    i2 = w.upsert(spark.createDataFrame([(5, -1.0)], "k long, v double"))
    w.upsert(spark.createDataFrame([(5, -2.0)], "k long, v double"))
    t = mk()
    assert {r.v for r in t.snapshot(spark, instant=i2).filter("k=5").collect()} == {-1.0}
    assert {r.v for r in t.snapshot(spark).filter("k=5").collect()} == {-2.0}


def test_latest_commit_wins_and_precombine_breaks_in_batch_ties(spark, tmp_path):
    df = spark.createDataFrame([(1, 100.0, 5)], "k long, v double, ts int")
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", precombine="ts", n_buckets=2)
    w.insert(df)
    # one commit with two versions of key 1: the larger ts must win
    w.upsert(spark.createDataFrame([(1, 7.0, 9), (1, 8.0, 3)], "k long, v double, ts int"))
    t = HudiMorTable(tmp_path / "t")
    assert [(r.v, r.ts) for r in t.snapshot(spark).collect()] == [(7.0, 9)]
    # a LATER commit with a smaller ts still wins (OverwriteWithLatest)
    w.upsert(spark.createDataFrame([(1, 6.0, 1)], "k long, v double, ts int"))
    assert [r.v for r in HudiMorTable(tmp_path / "t").snapshot(spark).collect()] == [6.0]
    # and a later delete removes the key outright
    w.delete(spark.createDataFrame([(1,)], "k long"))
    assert HudiMorTable(tmp_path / "t").snapshot(spark).count() == 0


def test_changes_since(spark, mor):
    w, mk = mor
    base = mk().position()
    w.upsert(spark.createDataFrame([(7, -1.0)], "k long, v double"))
    w.delete(spark.createDataFrame([(8,)], "k long"))
    df, pos = mk().changes_since(spark, base)
    assert [(r.k, r.v) for r in df.collect()] == [(7, -1.0)]
    none, pos2 = mk().changes_since(spark, pos)
    assert none is None and pos2.snapshot_id == pos.snapshot_id


def test_compaction_supersedes_logs(spark, mor):
    w, mk = mor
    w.upsert(spark.range(1, 11).select(F.col("id").alias("k"), F.lit(-1.0).alias("v")))
    w.delete(spark.createDataFrame([(40,)], "k long"))
    before = sorted((r.k, r.v) for r in mk().snapshot(spark).collect())
    assert w.compact(spark) is not None
    t = mk()
    after = sorted((r.k, r.v) for r in t.snapshot(spark).collect())
    assert after == before
    # compaction folded the logs into the base: read-optimized agrees
    assert sorted((r.k, r.v) for r in t.read_optimized(spark).collect()) == before
    # nothing dirty -> a second compaction is a no-op
    assert w.compact(spark) is None
    # post-compaction logs target the NEW base version
    w.upsert(spark.createDataFrame([(6, 99.0)], "k long, v double"))
    snap = {r.k: r.v for r in mk().snapshot(spark).collect()}
    assert snap[6] == 99.0 and snap[7] == -1.0


def test_scan_reports_all_predicates_residual(spark, mor):
    """Merge-on-read cannot push predicates below the merge: the
    negotiated plan must claim zero pushed filters and re-apply all of
    them post-merge."""
    from cdf_spark.expressions.ast import parse_predicate_text
    from cdf_spark.plans.scan import ScanRequest

    w, mk = mor
    w.upsert(spark.createDataFrame([(39, 1.0)], "k long, v double"))  # moves out of range
    req = ScanRequest(
        resource_id="mor",
        projection=["k", "v"],
        predicates=[parse_predicate_text("v >= 200.0")],
    )
    df, plan = mk().scan(spark, req)
    assert plan.pushed == [] and len(plan.all_engine_predicates()) == 1
    ks = {r.k for r in df.collect()}
    assert 39 not in ks and ks == set(range(20, 39)) | {40}


def test_single_insert_enforced_and_log_cap(spark, tmp_path):
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", max_rows=5)
    w.insert(df)
    with pytest.raises(HudiError, match="initial load"):
        w.insert(df)
    big = spark.range(10).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    with pytest.raises(HudiError, match="cap"):
        w.upsert(big)


def test_cow_reader_points_to_mor(spark, tmp_path):
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k")
    w.insert(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    with pytest.raises(HudiError, match="HudiMorTable"):
        HudiTable(tmp_path / "t")


def test_catalog_routes_mor(spark, tmp_path):
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.sources.catalog import (
        CatalogTable,
        CatalogTableResource,
        FileCatalog,
        StorageDescriptor,
    )

    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", n_buckets=2)
    w.insert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"))
    w.upsert(spark.createDataFrame([(1, -1.0)], "k long, v double"))
    cat = FileCatalog(
        {
            ("lake", "t_mor"): CatalogTable(
                name="t_mor",
                database="lake",
                table_type="EXTERNAL_TABLE",
                parameters={"table_type": "HUDI"},
                storage=StorageDescriptor(location=str(tmp_path / "t")),
            )
        }
    )
    src = CatalogTableResource(ResourceDescriptor(resource_id="t_mor"), cat, "lake", "t_mor")
    snap = src.snapshot_source()
    assert isinstance(snap, HudiMorTable)
    assert {(r.k, r.v) for r in snap.read(spark).collect()} == {(1, -1.0), (2, 2.0)}


# -- partitioned layouts (r7) ----------------------------------------------


@pytest.fixture()
def mor_part(spark, tmp_path):
    df = spark.range(1, 41).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("v"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("status"),
    )
    w = HudiMorFixtureWriter(
        tmp_path / "t", record_key="k", n_buckets=2, partition_by=["status"]
    )
    w.insert(df)
    return w, lambda: HudiMorTable(tmp_path / "t")


def test_partitioned_layout_and_snapshot(spark, mor_part):
    """Base + log files live under col=value/ dirs; snapshot merges
    across partitions; upsert/delete route partition-locally."""
    w, mk = mor_part
    root = w.root
    assert (root / "status=even").is_dir() and (root / "status=odd").is_dir()
    w.upsert(
        spark.createDataFrame(
            [(2, -1.0, "even"), (3, -2.0, "odd")], "k long, v double, status string"
        )
    )
    w.delete(spark.createDataFrame([(4, "even")], "k long, status string"))
    # log files landed inside the partition dirs
    assert list((root / "status=even").glob(".*.log.*"))
    assert list((root / "status=odd").glob(".*.log.*"))
    snap = {r.k: (r.v, r.status) for r in mk().snapshot(spark).collect()}
    assert set(snap) == set(range(1, 41)) - {4}
    assert snap[2] == (-1.0, "even") and snap[3] == (-2.0, "odd")
    assert snap[5] == (50.0, "odd")


def test_partitioned_scan_prunes_file_groups(spark, mor_part):
    """A partition-column predicate drops whole file groups (base +
    logs) BEFORE the merge — tri-state, so the result still equals the
    residual filter over the full snapshot."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w, mk = mor_part
    w.upsert(
        spark.createDataFrame(
            [(2, -1.0, "even"), (3, -2.0, "odd")], "k long, v double, status string"
        )
    )
    t = mk()
    out, plan = t.scan(
        spark, ScanRequest("mor", predicates=[Col("status") == Lit("odd")])
    )
    meta = plan.partitions.meta
    assert meta["files_pruned"] > 0
    assert meta["file_groups_kept"] < meta["file_groups_total"]
    rows = {r.k: r.v for r in out.collect()}
    full = {r.k: r.v for r in t.snapshot(spark).filter("status = 'odd'").collect()}
    assert rows == full and rows[3] == -2.0
    # no predicate is claimed as pushed (fidelity honesty unchanged:
    # the merge sits below the filters, so all are engine-applied)
    assert not plan.pushed and (plan.residual or plan.unsupported)


def test_partitioned_scan_all_pruned_returns_empty(spark, mor_part):
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    w, mk = mor_part
    out, plan = mk().scan(
        spark, ScanRequest("mor", predicates=[Col("status") == Lit("nope")])
    )
    assert plan.partitions.meta["file_groups_kept"] == 0
    assert out.count() == 0
    assert "k" in out.columns and "status" in out.columns


def test_partitioned_compaction_keeps_partition_dirs(spark, mor_part):
    w, mk = mor_part
    w.upsert(
        spark.createDataFrame(
            [(2, -1.0, "even"), (3, -2.0, "odd")], "k long, v double, status string"
        )
    )
    inst = w.compact(spark)
    assert inst is not None
    t = mk()
    # compacted bases landed under their partition dirs; no dirty logs
    slices = t.file_slices(t.latest_instant())
    assert all(not logs for _, _, _, logs in slices)
    assert all(
        part and f"/{part}/" in base.replace("\\", "/")
        for _, part, base, _ in slices
    )
    snap = {r.k: r.v for r in t.snapshot(spark).collect()}
    assert snap[2] == -1.0 and snap[3] == -2.0


def test_partitioned_read_optimized_and_changes(spark, mor_part):
    w, mk = mor_part
    full, pos = mk().changes_since(spark, None)
    assert full.count() == 40
    w.upsert(spark.createDataFrame([(2, -1.0, "even")], "k long, v double, status string"))
    inc, _ = mk().changes_since(spark, pos)
    assert {(r.k, r.v) for r in inc.collect()} == {(2, -1.0)}
    ro = {r.k: r.v for r in mk().read_optimized(spark).collect()}
    assert ro[2] == 20.0  # pending log invisible to read-optimized


def test_change_stream_windows_and_compaction(spark, tmp_path):
    """Change stream: per-instant windows, compaction contributes
    nothing, delete tombstones reconstitute the record key, and a
    cleaned log makes the affected window honestly unreplayable."""
    import pytest as _pytest

    from cdf_spark.sources.hudi_mor import HudiError

    df = spark.range(1, 51).select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
    w = HudiMorFixtureWriter(tmp_path / "t", record_key="k", n_buckets=2)
    w.insert(df)
    w.upsert(spark.range(1, 11).select(F.col("id").alias("k"), F.lit(-1.0).alias("v")))
    w.delete(spark.range(20, 26).select(F.col("id").alias("k")))
    w.compact(spark)
    t = HudiMorTable(tmp_path / "t")
    insts = t.instants()
    full = t.change_stream(spark)
    counts = {
        (r["_instant"], r["_change_type"]): r["count"]
        for r in full.groupBy("_instant", "_change_type").count().collect()
    }
    assert counts == {
        (insts[0], "upsert"): 50,
        (insts[1], "upsert"): 10,
        (insts[2], "delete"): 6,
    }  # the compaction instant is absent
    assert sorted(r.k for r in full.filter("_change_type='delete'").collect()) == list(
        range(20, 26)
    )
    # window (insts[0], insts[1]]: just the upsert
    win = t.change_stream(spark, from_instant=insts[0], to_instant=insts[1])
    assert {r["_change_type"]: r["count"] for r in win.groupBy("_change_type").count().collect()} == {
        "upsert": 10
    }
    # replay net effect matches the snapshot count
    assert t.read(spark).count() == 50 - 6
    # cleaned log -> the window raises instead of silently dropping
    t.clean(retain_commits=1)
    with _pytest.raises(HudiError):
        t.change_stream(spark).count()
