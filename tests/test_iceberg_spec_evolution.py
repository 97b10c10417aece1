"""Iceberg PARTITION SPEC EVOLUTION (`update_spec` + per-spec manifest
interpretation in `data_files_pruned`): a new default spec applies to
future commits only; existing files keep their original spec and no
data is rewritten (Iceberg spec, Partition Evolution). Reference frame:
the reference's scan driver negotiates partition pruning per file
(`crates/cdf-source-iceberg/src/driver.rs:902-1060`); under evolution
that interpretation must follow each manifest's own spec id."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdf_spark.expressions.ast import Binary, Col, Lit
from cdf_spark.sources.iceberg import (
    IcebergError,
    IcebergFixtureWriter,
    IcebergTable,
)


@pytest.fixture()
def evolved(tmp_path, orders):
    o = orders.select("o_orderkey", "o_orderstatus", "o_totalprice").filter(
        "o_orderkey > 0"
    )
    w = IcebergFixtureWriter(tmp_path / "t", seed=41, partition_by=["o_orderstatus"])
    w.append(o.filter("o_orderkey <= 200"), timestamp_ms=1_000)
    w.update_spec([("bucket", 8, "o_orderkey")])
    w.append(o.filter("o_orderkey > 200 AND o_orderkey <= 400"), timestamp_ms=2_000)
    return w, o


def test_spec_evolution_metadata_and_read(spark, tmp_path, evolved, orders):
    w, o = evolved
    t = IcebergTable(w.root)
    specs = {s["spec-id"]: s for s in t.metadata["partition-specs"]}
    assert set(specs) == {0, 1}
    assert t.metadata["default-spec-id"] == 1
    assert [f["transform"] for f in specs[0]["fields"]] == ["identity"]
    assert [f["transform"] for f in specs[1]["fields"]] == ["bucket[8]"]
    # partition field ids are table-unique across specs
    fids = [f["field-id"] for s in specs.values() for f in s["fields"]]
    assert len(fids) == len(set(fids))
    # full read returns both eras
    assert t.read(spark).count() == o.filter("o_orderkey <= 400").count()
    # time travel to the pre-evolution snapshot reads era A only
    first_sid = t.snapshots()[0]["snapshot-id"]
    assert t.read(spark, snapshot_id=first_sid).count() == o.filter(
        "o_orderkey <= 200"
    ).count()


def test_spec_evolution_prunes_each_era_under_its_own_spec(spark, evolved):
    w, o = evolved
    t = IcebergTable(w.root)
    sid = t.current_snapshot_id()
    # OLD spec: identity(status) pruning still fires on era-A files
    kept, ev = t.data_files_pruned(sid, [Binary("eq", Col("o_orderstatus"), Lit("F"))])
    assert ev["files_pruned"] > 0
    got = t.read(spark, _files=kept).filter("o_orderstatus = 'F'").count()
    assert got == o.filter("o_orderkey <= 400 AND o_orderstatus = 'F'").count()
    # NEW spec: bucket(o_orderkey) pruning fires on era-B files; era-A
    # files fall to column bounds (probe key is outside era A's range)
    key = int(
        o.filter("o_orderkey > 200 AND o_orderkey <= 400")
        .agg(F.max("o_orderkey"))
        .first()[0]
    )
    kept2, ev2 = t.data_files_pruned(sid, [Binary("eq", Col("o_orderkey"), Lit(key))])
    assert ev2["files_pruned"] > 0 and len(kept2) <= 2
    assert t.read(spark, _files=kept2).filter(F.col("o_orderkey") == key).count() == 1


def test_old_spec_identity_does_not_misread_new_records(spark, evolved):
    """A probe on the OLD spec's identity column must not prune era-B
    files through bucket records (different field list): era-B files
    carry no o_orderstatus partition value, so every era-B file is
    kept and the filtered result is complete across both eras."""
    w, o = evolved
    t = IcebergTable(w.root)
    kept, _ev = t.data_files_pruned(
        t.current_snapshot_id(), [Binary("eq", Col("o_orderstatus"), Lit("O"))]
    )
    got = t.read(spark, _files=kept).filter("o_orderstatus = 'O'").count()
    assert got == o.filter("o_orderkey <= 400 AND o_orderstatus = 'O'").count()


def test_resumed_writer_appends_under_evolved_spec(spark, tmp_path, evolved, orders):
    w, o = evolved
    w2 = IcebergFixtureWriter(w.root)  # resume: fresh writer instance
    assert w2._default_spec_id == 1
    assert [t for _c, t, _a, _sn in w2._spec_fields] == ["bucket"]
    w2.append(o.filter("o_orderkey > 400 AND o_orderkey <= 500"), timestamp_ms=3_000)
    t = IcebergTable(w.root)
    assert t.metadata["default-spec-id"] == 1
    assert t.read(spark).count() == o.filter("o_orderkey <= 500").count()
    # the new manifest is stamped with the evolved spec id
    rows = t._manifest_list_rows(t.snapshot(t.current_snapshot_id()))
    assert {r.get("partition_spec_id") for r in rows} == {0, 1}


def test_update_spec_guards(tmp_path, orders):
    o = orders.select("o_orderkey", "o_totalprice").limit(20)
    w = IcebergFixtureWriter(tmp_path / "t", seed=42)
    with pytest.raises(IcebergError, match="first append"):
        w.update_spec(["o_orderkey"])
    w.append(o, timestamp_ms=1_000)
    with pytest.raises(IcebergError, match="not in schema"):
        w.update_spec(["nope"])
    w2 = IcebergFixtureWriter(
        tmp_path / "t2", seed=43, partition_by=["o_orderkey"], omit_partition_cols=True
    )
    w2.append(o.limit(5), timestamp_ms=1_000)
    with pytest.raises(IcebergError, match="omit_partition_cols"):
        w2.update_spec([("bucket", 4, "o_orderkey")])
