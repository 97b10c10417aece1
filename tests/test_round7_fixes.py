"""Round-7 regression tests: each test falsifies one of the five
advisor-flagged defects (Roaring run-cookie offset header, float
timestamp micros, session-timezone temporal transforms, Delta DV
path-URI/column-collision, Hudi MoR arrival-order packing)."""

from __future__ import annotations

import datetime
import struct

import pytest
from pyspark.sql import functions as F

from cdf_spark.expressions.ast import Binary, Col, Lit
from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable
from cdf_spark.sources.delta_dv import DV_MAGIC, deserialize_dv_blob
from cdf_spark.sources.hudi_mor import HudiError, _pack_arrival_seq
from cdf_spark.sources.iceberg import (
    IcebergFixtureWriter,
    IcebergTable,
    _bucket_hash_bytes,
    _session_tz_is_utc,
)


# -- 1. Roaring run cookie: offset header present whenever n >= 4 ----------


def test_roaring_run_cookie_offset_header_with_four_containers():
    """Spec-conformant SERIAL_COOKIE stream: 4 containers (one of them
    run-encoded) MUST carry the offset header. The old decoder skipped
    it only when no run flags were set, so this stream misparsed."""
    n = 4
    cookie = struct.pack("<I", ((n - 1) << 16) | 12347)
    run_flags = bytes([0b00000100])  # container index 2 is a run
    headers = b"".join(
        struct.pack("<HH", k, card - 1)
        for k, card in [(0, 3), (1, 1), (2, 10), (3, 2)]
    )
    bodies = [
        struct.pack("<3H", 1, 2, 3),  # array
        struct.pack("<1H", 10),  # array
        struct.pack("<H", 1) + struct.pack("<HH", 5, 9),  # 1 run: 5..14
        struct.pack("<2H", 7, 9),  # array
    ]
    base = 4 + 1 + len(headers) + 4 * n
    offsets = b""
    pos = base
    for b in bodies:
        offsets += struct.pack("<I", pos)
        pos += len(b)
    stream = cookie + run_flags + headers + offsets + b"".join(bodies)
    blob = struct.pack("<I", DV_MAGIC) + struct.pack("<q", 1) + struct.pack("<I", 0) + stream
    expect = (
        [1, 2, 3]
        + [(1 << 16) + 10]
        + [(2 << 16) + v for v in range(5, 15)]
        + [(3 << 16) + 7, (3 << 16) + 9]
    )
    assert deserialize_dv_blob(blob) == expect


# -- 2. exact timestamp micros (no float64 total_seconds) ------------------


# epoch-seconds/micros pairs where float64 total_seconds()*1e6 is off
# by 1us (found by sweep; e.g. 1988-08-04T23:14:23.543873Z)
_FLOAT_WRONG = [(555122063, 543873), (1088594442, 943528), (539805736, 222436)]


def test_timestamp_bucket_micros_exact():
    epoch = datetime.datetime(1970, 1, 1)
    for secs, us in _FLOAT_WRONG:
        v = epoch + datetime.timedelta(seconds=secs, microseconds=us)
        exact = secs * 1_000_000 + us
        # the float path is genuinely wrong for these instants...
        assert int((v - epoch).total_seconds() * 1_000_000) != exact
        # ...and the hash input must be the exact micros long
        assert _bucket_hash_bytes(v, "timestamp") == struct.pack("<q", exact)


def test_ice_single_value_timestamp_micros_exact():
    epoch = datetime.datetime(1970, 1, 1)
    for secs, us in _FLOAT_WRONG:
        v = epoch + datetime.timedelta(seconds=secs, microseconds=us)
        assert IcebergFixtureWriter._ice_single_value(v, "timestamp") == secs * 1_000_000 + us


# -- 3. temporal transforms across session timezones -----------------------


@pytest.fixture()
def ny_tz(spark):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def test_session_tz_helper(spark, ny_tz):
    assert not _session_tz_is_utc()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert _session_tz_is_utc()


def test_day_transform_written_non_utc_prunes_correctly_under_utc(spark, tmp_path, ny_tz):
    """Writer derives day() from UTC epoch micros, so a table WRITTEN
    under a non-UTC session timezone still prunes exactly when read
    under UTC; under the non-UTC session the reader must WIDEN (skip
    transform pruning) rather than risk a wrong prune."""
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.timestamp_add(
            "HOUR", (F.col("id") % 96).cast("int"), F.to_timestamp(F.lit("2024-03-01 00:00:00"))
        ).alias("ts"),
    )
    w = IcebergFixtureWriter(tmp_path / "t", seed=5, partition_by=[("day", "ts")])
    w.append(df, timestamp_ms=1000)
    t = IcebergTable(tmp_path / "t")
    sid = int(t.metadata["current-snapshot-id"])
    lit = Lit(datetime.datetime(2024, 3, 3, 0, 0, 0))
    # non-UTC session: transform pruning over a timestamp column is
    # disabled — conservative widening, never a wrong prune
    kept_ny, ev_ny = t.data_files_pruned(sid, [Binary("ge", Col("ts"), lit)])
    assert ev_ny["files_pruned"] == 0
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    kept, ev = t.data_files_pruned(sid, [Binary("ge", Col("ts"), lit)])
    assert ev["files_pruned"] > 0
    assert (
        spark.read.parquet(*kept).filter("ts >= '2024-03-03 00:00:00'").count()
        == df.filter("ts >= timestamp'2024-03-03 00:00:00'").count()
    )


# -- 4. Delta DV: URI-encoded paths + user columns named _file/_pos --------


def test_dv_survives_special_char_paths_and_reserved_column_names(spark, tmp_path):
    root = tmp_path / "a b+c" / "t"  # space AND literal + in every file URI
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        F.lit("keep-me").alias("_file"),
        (F.col("id") + 1000).alias("_pos"),
    )
    w = DeltaFixtureWriter(root)
    w.append(df, timestamp_ms=1000)
    w.delete_where(spark, "k < 10", timestamp_ms=2000)
    out = DeltaTable(root).read(spark)
    rows = out.collect()
    # deleted rows must NOT silently reappear (URI percent-encoding
    # must not break the anti-join keyed on raw resolved paths)
    assert sorted(r.k for r in rows) == list(range(10, 100))
    # user columns with the old internal names survive untouched
    assert set(out.columns) == {"k", "_file", "_pos"}
    assert all(r._file == "keep-me" and r._pos == r.k + 1000 for r in rows)


# -- 5. Hudi MoR arrival-order packing -------------------------------------


def test_pack_arrival_seq_no_collision_and_bounds():
    # the old decimal packing collided (ver=0, block=1000) with
    # (ver=1, block=0); the bit packing must keep full ordering
    assert _pack_arrival_seq(0, 1000) < _pack_arrival_seq(1, 0)
    seqs = [
        _pack_arrival_seq(v, b) + r
        for v in (0, 1, 2)
        for b in (0, 999, 1000, 5000, (1 << 20) - 1)
        for r in (0, (1 << 24) - 1)
    ]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    with pytest.raises(HudiError, match="overflow"):
        _pack_arrival_seq(1 << 19, 0)
    with pytest.raises(HudiError, match="overflow"):
        _pack_arrival_seq(0, 1 << 20)


# -- 6. Delta column mapping (name mode) -----------------------------------


def test_column_mapping_name_mode_roundtrip(spark, tmp_path):
    """A name-mode column-mapped table (physical col-<uuid> parquet
    names) reads back with LOGICAL column names and identical values;
    a resuming writer keeps the same physical names."""
    import json as _json

    root = tmp_path / "t"
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    w = DeltaFixtureWriter(root, column_mapping="name")
    w.append(df.filter("k < 60"), timestamp_ms=1000)
    # physical file columns are NOT the logical names
    t = DeltaTable(root)
    files = t.files_for_version(t.current_version())
    import pyarrow.parquet as pq

    phys_cols = set(pq.read_schema(files[0]).names)
    assert phys_cols.isdisjoint({"k", "v"})
    assert all(c.startswith("col-") for c in phys_cols)
    # logical read
    out = t.read(spark)
    assert set(out.columns) == {"k", "v"}
    assert sorted(r.k for r in out.collect()) == list(range(60))
    # resume: a NEW writer instance must reuse the mapping
    w2 = DeltaFixtureWriter(root)
    w2.append(df.filter("k >= 60"), timestamp_ms=2000)
    out2 = DeltaTable(root).read(spark)
    assert sorted(r.k for r in out2.collect()) == list(range(100))
    assert {r.v for r in out2.filter("k = 99").collect()} == {198.0}


def test_column_mapping_composes_with_deletion_vectors(spark, tmp_path):
    root = tmp_path / "t"
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    w = DeltaFixtureWriter(root, column_mapping="name")
    w.append(df, timestamp_ms=1000)
    w.delete_where(spark, "k < 10", timestamp_ms=2000)  # logical-name predicate
    out = DeltaTable(root).read(spark)
    assert sorted(r.k for r in out.collect()) == list(range(10, 100))


def test_column_mapping_id_mode_without_ids_refused(spark, tmp_path):
    """A table CLAIMING id mode whose schemaString carries no
    delta.columnMapping.id per field is malformed — refuse rather than
    guess (id mode is otherwise supported via parquet field ids)."""
    import json as _json

    root = tmp_path / "t"
    w = DeltaFixtureWriter(root)
    w.append(spark.range(0, 5).select(F.col("id").alias("k")), timestamp_ms=1000)
    # tamper the metaData to claim id mode without per-field ids
    log = root / "_delta_log" / f"{0:020d}.json"
    lines = log.read_text().splitlines()
    out = []
    for ln in lines:
        a = _json.loads(ln)
        if "metaData" in a:
            a["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
        out.append(_json.dumps(a))
    log.write_text("\n".join(out) + "\n")
    with pytest.raises(Exception, match="delta.columnMapping.id"):
        DeltaTable(root).read(spark)


def test_column_mapping_changes_since_logical_names(spark, tmp_path):
    from cdf_spark.positions import TableSnapshotPosition

    root = tmp_path / "t"
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    w = DeltaFixtureWriter(root, column_mapping="name")
    w.append(df.filter("k < 30"), timestamp_ms=1000)
    t = DeltaTable(root)
    full, pos = t.changes_since(spark, None)
    assert set(full.columns) == {"k"}
    w.append(df.filter("k >= 30"), timestamp_ms=2000)
    inc, pos2 = DeltaTable(root).changes_since(spark, pos)
    assert set(inc.columns) == {"k"}
    assert sorted(r.k for r in inc.collect()) == list(range(30, 50))


# -- 7. Delta column mapping (id mode via parquet field ids) ---------------


def test_column_mapping_id_mode_roundtrip(spark, tmp_path):
    """An id-mode table (parquet field ids stamped into the data
    files) reads back with logical names, composes with DVs, and a
    resuming writer keeps the mapping."""
    root = tmp_path / "t"
    df = spark.range(0, 80).select(F.col("id").alias("k"), (F.col("id") * 3.0).alias("v"))
    w = DeltaFixtureWriter(root, column_mapping="id")
    w.append(df, timestamp_ms=1000)
    # files carry field ids + physical names
    t = DeltaTable(root)
    files = t.files_for_version(t.current_version())
    import pyarrow.parquet as pq

    sch = pq.read_schema(files[0])
    assert all(f.metadata and b"PARQUET:field_id" in f.metadata for f in sch)
    assert set(sch.names).isdisjoint({"k", "v"})
    out = t.read(spark)
    assert set(out.columns) == {"k", "v"}
    assert sorted(r.k for r in out.collect()) == list(range(80))
    w.delete_where(spark, "k < 5", timestamp_ms=2000)
    out2 = DeltaTable(root).read(spark)
    assert sorted(r.k for r in out2.collect()) == list(range(5, 80))


def test_column_mapping_id_mode_resolves_by_id_not_name(spark, tmp_path):
    """Falsification: physical names are SWAPPED relative to logical
    names (logical `a` lives in physical column named `b` and vice
    versa, same type). A name-based reader silently returns swapped
    values; the field-id reader must return the correct ones."""
    import json as _json

    from pyspark.sql import types as T

    root = tmp_path / "t"
    (root / "_delta_log").mkdir(parents=True)
    # physical file: column NAMED 'b' holds logical a's data (id 1),
    # column NAMED 'a' holds logical b's data (id 2)
    phys_schema = T.StructType(
        [
            T.StructField("b", T.LongType(), True, {"parquet.field.id": 1}),
            T.StructField("a", T.LongType(), True, {"parquet.field.id": 2}),
        ]
    )
    data = spark.createDataFrame([(10, 100), (20, 200)], phys_schema)
    data.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
    import shutil
    from pathlib import Path as _P

    src = sorted((tmp_path / "stage").glob("*.parquet"))[0]
    shutil.copy(src, root / "part-0.parquet")
    schema_string = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "a",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "b",
                    },
                },
                {
                    "name": "b",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "a",
                    },
                },
            ],
        }
    )
    lines = [
        _json.dumps({"commitInfo": {"timestamp": 1000, "operation": "WRITE"}}),
        _json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}),
        _json.dumps(
            {
                "metaData": {
                    "id": "swap",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": {
                        "delta.columnMapping.mode": "id",
                        "delta.columnMapping.maxColumnId": "2",
                    },
                }
            }
        ),
        _json.dumps(
            {
                "add": {
                    "path": "part-0.parquet",
                    "size": (root / "part-0.parquet").stat().st_size,
                    "partitionValues": {},
                    "modificationTime": 1000,
                    "dataChange": True,
                }
            }
        ),
    ]
    (root / "_delta_log" / f"{0:020d}.json").write_text("\n".join(lines) + "\n")
    rows = sorted(
        (r.a, r.b) for r in DeltaTable(root).read(spark).collect()
    )
    # logical a (field id 1) holds 10/20; logical b (id 2) holds 100/200
    assert rows == [(10, 100), (20, 200)]


# -- 8. partitioned Delta tables -------------------------------------------


def test_delta_partitioned_write_read_prune(spark, tmp_path):
    """Hive-partitioned Delta: partition columns live ONLY in
    add.partitionValues + dir names (not in the files, the protocol's
    layout); the reader reconstitutes them with declared types, and
    the scan prunes files from partitionValues before reading."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    root = tmp_path / "t"
    df = spark.range(0, 120).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("bucket3"),
        (F.col("id") * 2.0).alias("v"),
    )
    w = DeltaFixtureWriter(root, partition_by=["bucket3"])
    w.append(df, timestamp_ms=1000)
    t = DeltaTable(root)
    # files are under hive dirs and do NOT carry the partition column
    files = t.files_for_version(t.current_version())
    assert all("bucket3=" in f for f in files)
    import pyarrow.parquet as pq

    assert "bucket3" not in pq.read_schema(files[0]).names
    out = t.read(spark)
    assert set(out.columns) == {"k", "bucket3", "v"}
    assert dict(out.dtypes)["bucket3"] == "int"  # declared type restored
    assert out.count() == 120
    assert out.filter("bucket3 = 1").count() == 40
    # scan prunes by partitionValues
    res, plan = t.scan(spark, ScanRequest("d", predicates=[Col("bucket3") == Lit(1)]))
    meta = plan.partitions.meta
    assert meta["files_pruned"] > 0 and meta["files_kept"] >= 1
    assert res.count() == 40
    assert {r.bucket3 for r in res.collect()} == {1}


def test_delta_partitioned_dv_delete_and_checkpoint(spark, tmp_path):
    """delete_where may reference partition columns (basePath read);
    the DV re-add and the checkpoint both preserve partition dirs and
    partitionValues, so a log-cleaned partitioned table still reads
    and prunes."""
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    root = tmp_path / "t"
    df = spark.range(0, 90).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("p")
    )
    w = DeltaFixtureWriter(root, partition_by=["p"])
    w.append(df, timestamp_ms=1000)
    w.delete_where(spark, "p = 2 AND k < 50", timestamp_ms=2000)
    t = DeltaTable(root)
    out = t.read(spark)
    assert out.count() == 90 - df.filter("p = 2 AND k < 50").count()
    assert out.filter("p = 2").count() == df.filter("p = 2 AND k >= 50").count()
    # checkpoint + clean: state survives with partitions intact
    w.checkpoint()
    w.clean_log(before_version=t.current_version() + 1)
    t2 = DeltaTable(root)
    out2 = t2.read(spark)
    assert out2.count() == out.count()
    res, plan = t2.scan(spark, ScanRequest("d", predicates=[Col("p") == Lit(0)]))
    assert plan.partitions.meta["files_pruned"] > 0
    assert res.count() == 30


def test_delta_partitioned_changes_since_and_resume(spark, tmp_path):
    from cdf_spark.positions import TableSnapshotPosition

    root = tmp_path / "t"
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("p")
    )
    w = DeltaFixtureWriter(root, partition_by=["p"])
    w.append(df.filter("k < 40"), timestamp_ms=1000)
    t = DeltaTable(root)
    full, pos = t.changes_since(spark, None)
    assert full.count() == 40 and set(full.columns) == {"k", "p"}
    # resume with a FRESH writer (partition spec rehydrates from log)
    w2 = DeltaFixtureWriter(root)
    assert w2.partition_by == ["p"]
    w2.append(df.filter("k >= 40"), timestamp_ms=2000)
    inc, _ = DeltaTable(root).changes_since(spark, pos)
    assert sorted(r.k for r in inc.collect()) == list(range(40, 60))
    assert dict(inc.dtypes)["p"] == "int"


# -- 9. schema evolution on append (Iceberg widen + Delta metaData) --------


def test_iceberg_append_widens_schema(spark, tmp_path):
    """Appending a frame with an unseen column WIDENS the table schema
    (fresh field id) instead of silently dropping the column; older
    files read it as null — the spec's safe evolution, automatic on
    the destination path."""
    df1 = spark.range(0, 10).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    df2 = spark.range(10, 20).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"), F.lit("web").alias("channel")
    )
    w = IcebergFixtureWriter(tmp_path / "t", seed=81)
    w.append(df1, timestamp_ms=1000)
    w.append(df2, timestamp_ms=2000)
    out = IcebergTable(tmp_path / "t").read(spark)
    assert set(out.columns) == {"k", "v", "channel"}
    rows = {r.k: r.channel for r in out.collect()}
    assert all(rows[k] is None for k in range(10))
    assert all(rows[k] == "web" for k in range(10, 20))


def test_delta_append_widens_schema_string(spark, tmp_path):
    """A widening append rides an updated metaData action in the SAME
    commit (real Delta's ADD COLUMNS shape) — the declared schema never
    goes stale, and reads null-fill deterministically from the declared
    schema rather than whichever file footer Spark samples."""
    import json as _json

    df1 = spark.range(0, 10).select(F.col("id").alias("k"))
    df2 = spark.range(10, 20).select(F.col("id").alias("k"), F.lit(1.5).alias("w"))
    wt = DeltaFixtureWriter(tmp_path / "t")
    wt.append(df1, timestamp_ms=1000)
    wt.append(df2, timestamp_ms=2000)
    t = DeltaTable(tmp_path / "t")
    md = t.metadata_for_version(t.current_version())
    names = [f["name"] for f in _json.loads(md["schemaString"])["fields"]]
    assert names == ["k", "w"]
    out = t.read(spark)
    assert set(out.columns) == {"k", "w"}
    rows = {r.k: r.w for r in out.collect()}
    assert all(rows[k] is None for k in range(10))
    assert all(rows[k] == 1.5 for k in range(10, 20))
    # pre-widen pin still reads the old shape
    assert set(t.read(spark, version=0).columns) == {"k"}


def test_delta_mapped_append_widens_with_physical_name(spark, tmp_path):
    df1 = spark.range(0, 10).select(F.col("id").alias("k"))
    df2 = spark.range(10, 20).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    wt = DeltaFixtureWriter(tmp_path / "t", column_mapping="name")
    wt.append(df1, timestamp_ms=1000)
    wt.append(df2, timestamp_ms=2000)
    out = DeltaTable(tmp_path / "t").read(spark)
    assert set(out.columns) == {"k", "tag"}
    rows = {r.k: r.tag for r in out.collect()}
    assert all(rows[k] is None for k in range(10))
    assert all(rows[k] == "x" for k in range(10, 20))
