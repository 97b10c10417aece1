"""Delta deletion vectors: Z85 codec (spec vector), portable
RoaringBitmap(Array) round-trips incl. run-container decode, DV file
framing with checksum detection, merge-on-read application, DV-on-DV
merge, inline storage, checkpoint survival, and protocol gating."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable
from cdf_spark.sources.delta_dv import (
    DV_MAGIC,
    DeletionVectorError,
    decode_descriptor,
    deserialize_dv_blob,
    encode_inline,
    read_dv_from_file,
    serialize_dv_blob,
    write_dv_file,
    z85_decode,
    z85_encode,
)

# -- primitives ------------------------------------------------------------


def test_z85_spec_vector():
    # the Z85 spec's canonical test vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw
    with pytest.raises(DeletionVectorError, match="multiple of 4"):
        z85_encode(b"abc")


def test_roaring_roundtrip_array_bitmap_and_highkeys():
    import random

    rnd = random.Random(7)
    cases = [
        [0],
        [1, 2, 3, 65535, 65536, 100000],
        sorted(rnd.sample(range(200000), 6000)),  # forces a bitmap container
        [5, 2**32 + 1, 2**33, 2**40 + 7],  # multiple 32-bit high keys
    ]
    for vals in cases:
        assert deserialize_dv_blob(serialize_dv_blob(vals)) == sorted(set(vals))


def test_roaring_run_container_decode():
    """Real Delta writers run-compress; the reader must decode the
    12347 cookie + run containers it never writes itself."""
    cookie = struct.pack("<I", (1 - 1) << 16 | 12347) + b"\x01"
    hdr = struct.pack("<HH", 1, 9)  # high-16 key 1, cardinality 10
    runs = struct.pack("<H", 1) + struct.pack("<HH", 5, 9)  # run 5..14
    blob = (
        struct.pack("<I", DV_MAGIC)
        + struct.pack("<q", 1)
        + struct.pack("<I", 0)
        + cookie
        + hdr
        + runs
    )
    assert deserialize_dv_blob(blob) == [(1 << 16) + v for v in range(5, 15)]


def test_dv_file_checksum_detects_corruption(tmp_path):
    b1, b2 = serialize_dv_blob([1, 5, 9]), serialize_dv_blob([2**33])
    spans = write_dv_file(tmp_path / "dv.bin", [b1, b2])
    raw = (tmp_path / "dv.bin").read_bytes()
    assert read_dv_from_file(raw, *spans[0]) == b1
    assert read_dv_from_file(raw, *spans[1]) == b2
    bad = bytearray(raw)
    bad[spans[1][0] + 6] ^= 0xFF
    with pytest.raises(DeletionVectorError, match="checksum"):
        read_dv_from_file(bytes(bad), *spans[1])


def test_inline_descriptor_pads_and_trims():
    blob = serialize_dv_blob([3, 4, 5])
    desc = {
        "storageType": "i",
        "pathOrInlineDv": encode_inline(blob),
        "sizeInBytes": len(blob),
        "cardinality": 3,
    }
    assert decode_descriptor(desc, "/nonexistent") == [3, 4, 5]
    # a wrong cardinality must fail loudly, not silently under-delete
    desc["cardinality"] = 2
    with pytest.raises(DeletionVectorError, match="cardinality"):
        decode_descriptor(desc, "/nonexistent")


# -- table-level -----------------------------------------------------------


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.range(0, 200).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(df, timestamp_ms=1000)
    return w, lambda: DeltaTable(tmp_path / "t")


def test_dv_delete_snapshot_and_time_travel(spark, table):
    w, mk = table
    v0 = 0
    w.delete_where(spark, "k < 20", timestamp_ms=2000)
    t = mk()
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(20, 200))
    assert t.read(spark, version=v0).count() == 200  # pin predates the DV


def test_dv_merge_on_reattach(spark, table):
    w, mk = table
    w.delete_where(spark, "k < 20", timestamp_ms=2000)
    w.delete_where(spark, "k >= 190", timestamp_ms=3000)  # same files: must merge
    assert sorted(r.k for r in mk().read(spark).collect()) == list(range(20, 190))


def test_dv_inline_storage(spark, tmp_path):
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(df, timestamp_ms=1000)
    w.delete_where(spark, "k % 2 = 0", timestamp_ms=2000, inline=True)
    t = DeltaTable(tmp_path / "t")
    assert t.read(spark).count() == 25
    dvs = [dv for _f, dv in t.live_files_with_dvs(t.current_version()) if dv]
    assert dvs and all(d["storageType"] == "i" for d in dvs)


def test_dv_state_survives_checkpoint_and_log_clean(spark, table):
    w, mk = table
    w.delete_where(spark, "k < 20", timestamp_ms=2000)
    w.checkpoint()
    w.clean_log(mk().current_version())
    t = mk()
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(20, 200))
    # the checkpoint's protocol row must advertise the reader feature
    acts = t._checkpoint_actions(t.current_version())
    proto = next(a["protocol"] for a in acts if a.get("protocol"))
    assert "deletionVectors" in (proto.get("readerFeatures") or [])


def test_dv_cap_guards_bulk_deletes(spark, table):
    w, _mk = table
    with pytest.raises(DeltaError, match="cap"):
        w.delete_where(spark, "k >= 0", max_rows=50)


def test_unknown_reader_features_still_refused(spark, table):
    w, mk = table
    import json as _json

    path = w.root / "_delta_log" / f"{w._version + 1:020d}.json"
    path.write_text(
        _json.dumps(
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors", "v2Checkpoint"],
                }
            }
        )
        + "\n"
    )
    with pytest.raises(DeltaError, match="v2Checkpoint"):
        mk().read(spark)


def test_dv_merge_into_column_mapped_table(spark, tmp_path, orders):
    """DV MERGE into a NAME-mode column-mapped table: victims matched
    under physical names, batch rewritten to physical names, base
    files untouched with DVs attached, logical reads correct — and it
    composes with a prior rename (merge keyed on the current logical
    name)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t", column_mapping="name")
    w.append(o.filter("o_orderkey <= 500"), timestamp_ms=1_000)
    w.rename_column("o_totalprice", "price", timestamp_ms=2_000)
    t0 = DeltaTable(tmp_path / "t")
    base_files = set(t0.files_for_version(t0.current_version()))
    batch = (
        o.filter("o_orderkey <= 50").withColumnRenamed("o_totalprice", "price")
        .withColumn("price", F.lit(-1.0))
        .unionByName(
            o.filter("o_orderkey > 500 AND o_orderkey <= 550")
            .withColumnRenamed("o_totalprice", "price")
        )
    )
    seg = tempfile.mkdtemp()
    batch.coalesce(1).write.mode("overwrite").parquet(seg)
    segs = sorted(str(p) for p in __import__("pathlib").Path(seg).glob("*.parquet"))
    w.upsert_files_dv(spark, segs, ["o_orderkey"], timestamp_ms=3_000)
    shutil.rmtree(seg, ignore_errors=True)
    t1 = DeltaTable(tmp_path / "t")
    live = t1.live_files_with_dvs(t1.current_version())
    assert base_files <= {p for p, _dv in live}  # no base rewrite
    assert any(dv for _p, dv in live)  # DVs attached
    got = t1.read(spark)
    assert set(got.columns) == {"o_orderkey", "price"}
    assert got.count() == 550
    assert got.filter("o_orderkey <= 50 AND price != -1.0").count() == 0
    assert got.filter("o_orderkey > 50 AND o_orderkey <= 500 AND price = -1.0").count() == 0


def test_change_data_feed_edges(spark, tmp_path, orders):
    """CDF edge semantics: previously-DELETED keys re-upserted classify
    as INSERT (resolved-state classification); non-CDF tables refuse
    table_changes; an overwrite makes its range honestly
    unreconstructible; maintenance commits contribute nothing."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(o.filter("o_orderkey <= 100"), timestamp_ms=1_000)  # v0
    w.delete_where(spark, "o_orderkey <= 10", timestamp_ms=2_000)  # v1
    # v2: re-upsert the deleted keys 1..10 — resolved-state
    # classification makes them INSERTS, not updates
    batch = o.filter("o_orderkey <= 10").withColumn("o_totalprice", F.lit(-5.0))
    seg = tempfile.mkdtemp()
    batch.coalesce(1).write.mode("overwrite").parquet(seg)
    segs = sorted(str(p) for p in Path(seg).glob("*.parquet"))
    w.upsert_files_dv(spark, segs, ["o_orderkey"], timestamp_ms=3_000)
    shutil.rmtree(seg, ignore_errors=True)
    t = DeltaTable(tmp_path / "t")
    v2 = t.table_changes(spark, 2, 2)
    by_type = {r["_change_type"]: r["count"] for r in v2.groupBy("_change_type").count().collect()}
    assert by_type == {"insert": 10}
    # v3: OPTIMIZE contributes no changes and doesn't break the range
    w.optimize_small_files(spark, small_bytes=1 << 30, timestamp_ms=4_000)
    all_ch = t.table_changes(spark, 0)
    assert all_ch.filter("_commit_version = 3").count() == 0
    assert all_ch.count() == 100 + 10 + 10
    # v4: overwrite — r10 derives its net change set from the log diff
    # (r8 raised here): 100 prior live rows delete, 50 new rows insert
    w.overwrite(o.filter("o_orderkey > 100 AND o_orderkey <= 150"), timestamp_ms=5_000)
    t2 = DeltaTable(tmp_path / "t")
    v4 = t2.table_changes(spark, 4, 4)
    by4 = {r["_change_type"]: r["count"] for r in v4.groupBy("_change_type").count().collect()}
    assert by4 == {"delete": 100, "insert": 50}
    # the full range replays straight through the overwrite
    assert t2.table_changes(spark, 0).count() == 120 + 150
    # ... and ranges before it are unchanged
    assert t2.table_changes(spark, 0, 3).count() == 120
    # non-CDF table refuses
    w2 = DeltaFixtureWriter(tmp_path / "plain")
    w2.append(o.limit(5), timestamp_ms=1_000)
    with pytest.raises(DeltaError):
        DeltaTable(tmp_path / "plain").table_changes(spark, 0)


def test_change_data_feed_mapped_and_partitioned(spark, tmp_path, orders):
    """CDF composes with column mapping (logical names in change
    files, derived inserts resolved once, not double-mapped) and with
    partitioning (partition columns ride the change rows)."""
    import shutil
    import tempfile
    from pathlib import Path

    from pyspark.sql import functions as F

    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    # -- column-mapped CDF table
    w = DeltaFixtureWriter(tmp_path / "cm", column_mapping="name", change_data_feed=True)
    w.append(o.filter("o_orderkey <= 50"), timestamp_ms=1_000)
    w.delete_where(spark, "o_orderkey <= 5", timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "cm")
    ch = t.table_changes(spark, 0)
    assert set(ch.columns) >= {"o_orderkey", "o_totalprice", "_change_type"}
    by = {r["_change_type"]: r["count"] for r in ch.groupBy("_change_type").count().collect()}
    assert by == {"insert": 50, "delete": 5}
    # -- partitioned CDF table: merge keyed on the partition column too
    op = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").filter("o_orderkey > 0")
    wp = DeltaFixtureWriter(tmp_path / "p", partition_by=["o_orderstatus"], change_data_feed=True)
    wp.append(op.filter("o_orderkey <= 100"), timestamp_ms=1_000)
    batch = op.filter("o_orderkey <= 10").withColumn("o_totalprice", F.lit(-1.0))
    seg = tempfile.mkdtemp()
    batch.coalesce(1).write.mode("overwrite").parquet(seg)
    segs = sorted(str(p) for p in Path(seg).glob("*.parquet"))
    wp.upsert_files_dv(spark, segs, ["o_orderkey"], timestamp_ms=2_000)
    shutil.rmtree(seg, ignore_errors=True)
    tp = DeltaTable(tmp_path / "p")
    chp = tp.table_changes(spark, 0)
    assert "o_orderstatus" in chp.columns  # partition col rides the changes
    byp = {r["_change_type"]: r["count"] for r in chp.groupBy("_change_type").count().collect()}
    assert byp == {"insert": 100, "update_preimage": 10, "update_postimage": 10}
    assert chp.filter("o_orderstatus IS NULL").count() == 0


def test_vacuum_keeps_referenced_cdc_files(spark, tmp_path, orders):
    """Regression (found by self-review): vacuum at retention 0 used
    to delete a fresh commit's CHANGE DATA file, breaking
    table_changes for a fully live version. CDC files referenced by a
    surviving commit JSON are live; once clean_log removes the
    referencing commit, they reclaim."""
    from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(o.limit(50), timestamp_ms=1_000)
    w.delete_where(spark, "o_orderkey <= 5", timestamp_ms=2_000)  # v1 + cdc
    t = DeltaTable(tmp_path / "t")
    assert t.vacuum(retention_ms=0)["deleted"] == []
    assert t.table_changes(spark, 0).count() == 55
    # a later commit, then clean the log PAST the cdc commit: its
    # change file is now unreferenced and reclaims
    w.delete_where(spark, "o_orderkey = 7", timestamp_ms=3_000)
    w.checkpoint()
    w.clean_log(before_version=2)
    t2 = DeltaTable(tmp_path / "t")
    res = t2.vacuum(retention_ms=0)
    reclaimed_cdc = [p for p in res["deleted"] if "_change_data" in p]
    assert len(reclaimed_cdc) == 1  # v1's cdc file; v2's stays referenced
    assert t2.read(spark).count() == 44
    assert t2.table_changes(spark, 2).count() == 1  # v2 still replays
