"""Delta-Lake-format reader: transaction-log replay, version/timestamp
time travel, incremental consumption with remove-action resets, and
catalog routing (`cdf_spark/sources/delta.py`, jar-free)."""

from __future__ import annotations

import pytest

from cdf_spark.positions import TableSnapshotPosition
from cdf_spark.sources.delta import (
    DeltaError,
    DeltaFixtureWriter,
    DeltaTable,
    is_delta_layout,
)


@pytest.fixture()
def table(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(100), timestamp_ms=1_000)
    w.append(o.offset(100).limit(50), timestamp_ms=2_000)
    w.append(o.offset(150).limit(25), timestamp_ms=3_000)
    return DeltaTable(tmp_path / "t")


def test_layout_detection(table, tmp_path):
    assert is_delta_layout(table.root)
    assert not is_delta_layout(tmp_path)
    with pytest.raises(DeltaError):
        DeltaTable(tmp_path / "nope")


def test_log_replay_and_versions(spark, table):
    assert table.versions() == [0, 1, 2]
    assert table.current_version() == 2
    assert table.read(spark, version=0).count() == 100
    assert table.read(spark, version=1).count() == 150
    assert table.read(spark).count() == 175


def test_time_travel_by_timestamp(spark, table):
    assert table.version_as_of(1_500) == 0
    assert table.read(spark, as_of_ms=2_000).count() == 150
    with pytest.raises(DeltaError):
        table.version_as_of(500)


def test_changes_since_added_files_only(spark, table):
    df, pos = table.changes_since(spark, TableSnapshotPosition(snapshot_id=0))
    assert df.count() == 75
    assert pos == TableSnapshotPosition(snapshot_id=2)
    df2, pos2 = table.changes_since(spark, pos)
    assert df2 is None and pos2 == pos
    df3, _ = table.changes_since(spark, None)
    assert df3.count() == 175


def test_overwrite_emits_removes_and_resets_consumers(spark, tmp_path, orders):
    w = DeltaFixtureWriter(tmp_path / "t")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(100), timestamp_ms=1_000)
    w.overwrite(o.offset(100).limit(40), timestamp_ms=2_000)
    w.append(o.offset(140).limit(10), timestamp_ms=3_000)
    t = DeltaTable(tmp_path / "t")
    # replay: remove actions drop version-0 files from the live set
    assert t.read(spark, version=0).count() == 100  # time travel intact
    assert t.read(spark, version=1).count() == 40
    assert t.read(spark).count() == 50
    # consumer at version 0 crosses the overwrite -> full re-read
    df, pos = t.changes_since(spark, TableSnapshotPosition(snapshot_id=0))
    assert pos.snapshot_id == 2 and df.count() == 50
    # consumer at version 1 -> plain delta
    df2, _ = t.changes_since(spark, TableSnapshotPosition(snapshot_id=1))
    assert df2.count() == 10


def test_scan_negotiated_pushdown(spark, table):
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    req = ScanRequest(
        "delta_orders",
        projection=["o_orderkey"],
        predicates=[Col("o_orderkey") <= Lit(50)],
    )
    df, plan = table.scan(spark, req, version=0)
    assert df.columns == ["o_orderkey"]
    assert df.count() == 51  # keys 0..50 within the first 100-row commit
    assert plan.pushed or plan.residual


def test_catalog_routes_delta_class(spark, table):
    from cdf_spark.sources.base import ResourceDescriptor
    from cdf_spark.sources.catalog import (
        CatalogTable,
        CatalogTableResource,
        FileCatalog,
        StorageDescriptor,
    )
    from cdf_spark.expressions.ast import Col, Lit
    from cdf_spark.plans.scan import ScanRequest

    cat = FileCatalog(
        {
            ("lake", "orders_delta"): CatalogTable(
                name="orders_delta",
                database="lake",
                table_type="EXTERNAL_TABLE",
                parameters={"table_type": "DELTA"},
                storage=StorageDescriptor(location=str(table.root)),
            )
        }
    )
    src = CatalogTableResource(
        ResourceDescriptor(resource_id="orders_delta"), cat, "lake", "orders_delta"
    )
    reader = src.snapshot_source()
    assert isinstance(reader, DeltaTable)
    assert reader.read(spark, version=1).count() == 150
    plan = src.negotiate(ScanRequest("orders_delta", predicates=[Col("o_totalprice") > Lit(0.0)]))
    assert plan.pushed or plan.residual


def test_commit_file_shape(table):
    """Commit 0 carries protocol + metaData per the Delta spec; adds are
    root-relative paths with dataChange=true."""
    acts = table.actions(0)
    kinds = [next(iter(a)) for a in acts]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(not a["path"].startswith("/") and a["dataChange"] for a in adds)


def test_protocol_guard_refuses_unsupported_features(spark, tmp_path, orders):
    """Detect-and-refuse for table features the jar-free reader cannot
    honor: column mapping, raised minReaderVersion with unknown reader
    features, and checkpoint-truncated logs. Silently misreading any
    of these returns wrong data (wrong columns / dropped files).
    Deletion vectors are no longer refused — they are decoded
    merge-on-read (test_delta_dv.py)."""
    import json as _json

    import pytest as _pytest

    o = orders.select("o_orderkey", "o_totalprice").limit(10)

    def fresh(name):
        w = DeltaFixtureWriter(tmp_path / name)
        w.append(o, timestamp_ms=1000)
        return tmp_path / name

    # column mapping: NAME and ID modes are supported (r7); an
    # UNKNOWN mode must refuse rather than misread
    root = fresh("cm")
    (root / "_delta_log" / f"{1:020d}.json").write_text(
        _json.dumps({"metaData": {"id": "m", "configuration":
                     {"delta.columnMapping.mode": "bogus"}}})
    )
    with _pytest.raises(DeltaError, match="not supported"):
        DeltaTable(root).read(spark)

    # raised reader protocol with unknown features
    root = fresh("proto")
    (root / "_delta_log" / f"{1:020d}.json").write_text(
        _json.dumps({"protocol": {"minReaderVersion": 3,
                                  "readerFeatures": ["v2Checkpoint"]}})
    )
    with _pytest.raises(DeltaError, match="unsupported reader protocol"):
        DeltaTable(root).read(spark)

    # deletionVectors alone is now honored — must NOT refuse
    root = fresh("dvfeat")
    (root / "_delta_log" / f"{1:020d}.json").write_text(
        _json.dumps({"protocol": {"minReaderVersion": 3,
                                  "readerFeatures": ["deletionVectors"]}})
    )
    assert DeltaTable(root).read(spark).count() == 10

    # timestampNtz alone is harmless — must NOT refuse
    root = fresh("ntz")
    (root / "_delta_log" / f"{1:020d}.json").write_text(
        _json.dumps({"protocol": {"minReaderVersion": 3,
                                  "readerFeatures": ["timestampNtz"]}})
    )
    assert DeltaTable(root).read(spark).count() == 10

    # checkpoint marker -> possibly truncated log
    root = fresh("ckpt")
    (root / "_delta_log" / "_last_checkpoint").write_text('{"version": 0}')
    with _pytest.raises(DeltaError, match="_last_checkpoint"):
        DeltaTable(root).read(spark)


def test_checkpoint_replay_after_log_cleaning(spark, tmp_path, orders):
    """Production layout: checkpoint parquet + cleaned JSON log. The
    reader seeds the live set from the checkpoint (complete replay of
    0..ckpt) and applies only the surviving JSON commits after it;
    pins inside the cleaned range raise instead of silently dropping
    files; incremental consumers checkpointed before the cleaned range
    reset to a full re-read."""
    from pyspark.sql import functions as F

    o = orders.select("o_orderkey", "o_totalprice")
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(o.filter(F.col("o_orderkey") <= 400), timestamp_ms=1000)       # v0
    w.append(o.filter((F.col("o_orderkey") > 400) & (F.col("o_orderkey") <= 900)),
             timestamp_ms=2000)                                              # v1
    ck = w.checkpoint()                                                      # ckpt @ v1
    assert ck == 1
    w.append(o.filter(F.col("o_orderkey") > 900), timestamp_ms=3000)        # v2
    w.clean_log(before_version=2)  # only v2 json + checkpoint survive

    t = DeltaTable(tmp_path / "t")
    assert t.current_version() == 2
    # full state reconstructed: checkpoint base + v2 adds
    assert t.read(spark).count() == o.count()
    # pin at the checkpoint version works from the checkpoint alone
    assert t.read(spark, version=1).count() == o.filter(F.col("o_orderkey") <= 900).count()
    # pin inside the cleaned range must refuse, not drop files
    with pytest.raises(DeltaError, match="not in log|incomplete"):
        t.files_for_version(0)
    # incremental: consumer at v1 (the checkpoint) still gets the v2 delta
    df, pos = t.changes_since(spark, TableSnapshotPosition(snapshot_id=1))
    assert df.count() == o.filter(F.col("o_orderkey") > 900).count()
    # consumer checkpointed BEFORE the cleaned range: full re-read reset
    df0, _ = t.changes_since(spark, TableSnapshotPosition(snapshot_id=0))
    assert df0.count() == o.count()
    # checkpoint rows run the same protocol guard: poison the checkpoint
    import pyarrow as pa
    import pyarrow.parquet as pq

    ckpt_path = tmp_path / "t" / "_delta_log" / f"{1:020d}.checkpoint.parquet"
    rows = pq.read_table(ckpt_path).to_pylist()
    for r in rows:
        if r.get("metaData"):
            r["metaData"]["configuration"] = {"delta.columnMapping.mode": "bogus"}
    pq.write_table(pa.Table.from_pylist(rows), ckpt_path)
    with pytest.raises(DeltaError, match="not supported"):
        DeltaTable(tmp_path / "t").read(spark)


def test_delta_history_table(spark, tmp_path, orders):
    from cdf_spark.sources.delta import delta_history

    o = orders.select("o_orderkey", "o_totalprice")
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(o.limit(100), timestamp_ms=1000)
    w.append(o.offset(100).limit(50), timestamp_ms=2000)
    w.checkpoint()
    w.append(o.offset(150).limit(25), timestamp_ms=3000)
    w.clean_log(before_version=2)

    h = delta_history(spark, DeltaTable(tmp_path / "t"))
    rows = {r.version: r for r in h.collect()}
    assert rows[1].operation == "CHECKPOINT" and rows[1].num_adds >= 2
    assert rows[2].operation == "WRITE" and rows[2].num_adds == 1
    assert 0 not in rows  # cleaned version is gone; state lives in the checkpoint


def test_column_mapping_rename_is_metadata_only(spark, tmp_path, orders):
    """rename_column on a name-mode table: zero data files touched,
    new logical name resolves to the same physical column, earlier
    versions keep the earlier name, and a post-rename DV delete
    predicates on the NEW name."""
    from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t", column_mapping="name")
    w.append(o.limit(100), timestamp_ms=1_000)
    t0 = DeltaTable(tmp_path / "t")
    files_before = set(t0.files_for_version(t0.current_version()))
    w.rename_column("o_totalprice", "price", timestamp_ms=2_000)
    t1 = DeltaTable(tmp_path / "t")
    # metadata-only: identical physical files
    assert set(t1.files_for_version(t1.current_version())) == files_before
    df = t1.read(spark)
    assert set(df.columns) == {"o_orderkey", "price"}
    assert df.agg({"price": "sum"}).first()[0] == o.limit(100).agg(
        {"o_totalprice": "sum"}
    ).first()[0]
    # time travel: version 0 still presents the OLD logical name
    assert set(t1.read(spark, version=0).columns) == {"o_orderkey", "o_totalprice"}
    # DV delete composes with the renamed schema
    w.delete_where(spark, "price < 10000", timestamp_ms=3_000)
    t2 = DeltaTable(tmp_path / "t")
    remaining = t2.read(spark)
    assert remaining.filter("price < 10000").count() == 0
    assert remaining.count() == t1.read(spark, version=1).filter("price >= 10000").count()
    # guards
    import pytest as _pytest

    with _pytest.raises(DeltaError):
        w.rename_column("nope", "x")
    with _pytest.raises(DeltaError):
        w.rename_column("price", "o_orderkey")
    w2 = DeltaFixtureWriter(tmp_path / "plain")
    w2.append(o.limit(5), timestamp_ms=1_000)
    with _pytest.raises(DeltaError):
        w2.rename_column("o_orderkey", "k")


def test_check_constraints_enforced_and_persisted(spark, tmp_path, orders):
    """Delta CHECK constraints (delta.constraints.* configuration,
    minWriterVersion 3): adding validates EXISTING data, every
    data-adding commit is enforced, the flag survives schema widening
    and rename (metaData rewrites REPLACE configuration), a resumed
    writer keeps enforcing, and drop lifts enforcement."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(o.filter("o_orderkey <= 100"), timestamp_ms=1_000)
    w.add_check_constraint(spark, "price_pos", "o_totalprice > 0", timestamp_ms=2_000)
    t = DeltaTable(tmp_path / "t")
    assert t.check_constraints() == {"price_pos": "o_totalprice > 0"}
    # protocol upgraded for the writer feature
    assert any(
        a.get("protocol", {}).get("minWriterVersion") == 3
        for v in t.versions()
        for a in t.actions(v)
    )
    # violating batch refused BEFORE any commit
    v_before = t.current_version()
    with _pytest.raises(DeltaError, match="price_pos"):
        w.append(o.limit(5).withColumn("o_totalprice", F.lit(-1.0)), timestamp_ms=3_000)
    assert DeltaTable(tmp_path / "t").current_version() == v_before
    # conforming batch fine; widening keeps the constraint in conf
    w.append(
        o.filter("o_orderkey > 100 AND o_orderkey <= 150").withColumn(
            "tag", F.lit("x")
        ),
        timestamp_ms=4_000,
    )
    t2 = DeltaTable(tmp_path / "t")
    assert t2.check_constraints() == {"price_pos": "o_totalprice > 0"}
    # resumed writer rehydrates + enforces
    w2 = DeltaFixtureWriter(tmp_path / "t")
    with _pytest.raises(DeltaError, match="price_pos"):
        w2.append(o.limit(3).withColumn("o_totalprice", F.lit(-2.0)), timestamp_ms=5_000)
    # adding a constraint existing rows violate is refused
    with _pytest.raises(DeltaError, match="existing rows violate"):
        w2.add_check_constraint(spark, "key_small", "o_orderkey < 10")
    assert DeltaTable(tmp_path / "t").check_constraints() == {
        "price_pos": "o_totalprice > 0"
    }
    # merge batches enforced too
    import tempfile as _tf

    seg = _tf.mkdtemp()
    o.limit(4).withColumn("o_totalprice", F.lit(-3.0)).withColumn(
        "tag", F.lit("y")
    ).coalesce(1).write.mode("overwrite").parquet(seg)
    from pathlib import Path as _P

    segs = sorted(str(p) for p in _P(seg).glob("*.parquet"))
    with _pytest.raises(DeltaError, match="merge batch"):
        w2.upsert_files_dv(spark, segs, ["o_orderkey"], timestamp_ms=6_000)
    # drop lifts enforcement
    w2.drop_check_constraint("price_pos", timestamp_ms=7_000)
    assert DeltaTable(tmp_path / "t").check_constraints() == {}
    w2.append(o.limit(2).withColumn("o_totalprice", F.lit(-9.0)).withColumn("tag", F.lit("z")), timestamp_ms=8_000)


def test_table_changes_between_timestamps(spark, tmp_path, orders):
    """Timestamp-addressed CDF windows map to the version window by
    commit timestamps; a start past the latest commit raises (delta.io
    parity) and a mid-history window excludes commits outside it."""
    from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t", change_data_feed=True)
    w.append(o.filter("o_orderkey <= 50"), timestamp_ms=1_000)  # v0
    w.append(o.filter("o_orderkey > 50 AND o_orderkey <= 80"), timestamp_ms=2_000)  # v1
    w.delete_where(spark, "o_orderkey <= 10", timestamp_ms=3_000)  # v2
    t = DeltaTable(tmp_path / "t")
    full = t.table_changes_between_timestamps(spark, 0)
    assert full.count() == t.table_changes(spark, 0).count()
    mid = t.table_changes_between_timestamps(spark, 1_500, 2_500)  # v1 only
    assert {r._commit_version for r in mid.select("_commit_version").collect()} == {1}
    tail = t.table_changes_between_timestamps(spark, 2_500)  # v2 only
    assert {r._change_type for r in tail.select("_change_type").collect()} == {"delete"}
    with pytest.raises(DeltaError, match="after the latest commit"):
        t.table_changes_between_timestamps(spark, 9_999)
    with pytest.raises(DeltaError, match="precedes the first"):
        t.table_changes_between_timestamps(spark, 0, 500)


def test_check_constraints_enforced_on_segment_copy(spark, tmp_path, orders):
    """The segment-COPY commit paths (DeltaDestination's bulk
    append/replace) must enforce CHECK constraints too — found by
    self-review: they never build a DataFrame, so the df-based
    enforcement didn't fire."""
    import tempfile as _tf
    from pathlib import Path

    import pytest as _pytest
    from pyspark.sql import functions as F

    from cdf_spark.sources.delta import DeltaError, DeltaFixtureWriter, DeltaTable

    o = orders.select("o_orderkey", "o_totalprice").filter("o_orderkey > 0")
    w = DeltaFixtureWriter(tmp_path / "t")
    w.append(o.limit(50), timestamp_ms=1_000)
    w.add_check_constraint(spark, "pos", "o_totalprice > 0", timestamp_ms=2_000)

    def seg_of(df):
        d = _tf.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(d)
        return sorted(str(p) for p in Path(d).glob("*.parquet"))

    bad = seg_of(o.limit(3).withColumn("o_totalprice", F.lit(-1.0)))
    v = DeltaTable(tmp_path / "t").current_version()
    with _pytest.raises(DeltaError, match="segment batch"):
        w.append_files(bad, timestamp_ms=3_000)
    with _pytest.raises(DeltaError, match="segment batch"):
        w.replace_files(bad, timestamp_ms=3_000)
    assert DeltaTable(tmp_path / "t").current_version() == v  # nothing committed
    good = seg_of(o.filter("o_orderkey > 500").limit(3))
    w.append_files(good, timestamp_ms=4_000)
    assert DeltaTable(tmp_path / "t").current_version() == v + 1
