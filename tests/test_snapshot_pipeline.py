"""Incremental LoadPipeline over snapshot tables: Iceberg and Delta
deltas through contract -> package -> commit -> verify -> checkpoint,
resuming from the ledger's TableSnapshotPosition."""

from __future__ import annotations

import pytest

from cdf_spark.package.ledger import CheckpointLedger, ParquetDestination
from cdf_spark.sources.base import ResourceDescriptor, WriteDisposition
from cdf_spark.sources.delta import DeltaFixtureWriter, DeltaTable
from cdf_spark.sources.iceberg import IcebergFixtureWriter, IcebergTable
from cdf_spark.sources.snapshot_resource import POSITION_KEY, SnapshotLoadPipeline


@pytest.fixture()
def parts(spark, tmp_path):
    def make(table):
        ledger = CheckpointLedger(tmp_path / "ledger")
        return SnapshotLoadPipeline(
            table=table,
            descriptor=ResourceDescriptor(resource_id="orders_snap"),
            ledger=ledger,
            package_root=str(tmp_path / "pkgs"),
            destination=ParquetDestination(str(tmp_path / "dest")),
            disposition=WriteDisposition.APPEND,
        ), ledger

    return make


IDS = [6_000_000_000_000_000_001, 19, 2_000_000_000_000_000_003]


def test_iceberg_incremental_rounds(spark, tmp_path, orders, parts):
    w = IcebergFixtureWriter(tmp_path / "ice", seed=5)
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(100), timestamp_ms=1000, snapshot_id=IDS[0])
    pipe, ledger = parts(IcebergTable(tmp_path / "ice"))

    # round 1: full history
    r1 = pipe.run(spark)
    assert r1.rows_admitted == 100 and r1.receipt.verified
    pos = ledger.resume_position("orders_snap", POSITION_KEY)
    assert pos["snapshot_id"] == IDS[0] and pos["sequence_number"] == 1

    # round 2: nothing new -> no-op, position untouched
    assert pipe.run(spark) is None

    # new commit with a SMALLER random id — the ancestry walk must
    # still deliver it as the delta
    w.append(o.offset(100).limit(40), timestamp_ms=2000, snapshot_id=IDS[1])
    pipe2, _ = parts(IcebergTable(tmp_path / "ice"))
    pipe2.ledger = ledger
    r3 = pipe2.run(spark)
    assert r3.rows_admitted == 40  # ONLY the delta, not a re-read
    pos = ledger.resume_position("orders_snap", POSITION_KEY)
    assert pos["snapshot_id"] == IDS[1] and pos["sequence_number"] == 2

    # destination accumulated exactly the table's rows, each once
    dest = spark.read.parquet(str(tmp_path / "dest"))
    assert dest.count() == 140
    assert dest.select("o_orderkey").distinct().count() == 140


def test_delta_incremental_rounds(spark, tmp_path, orders, parts):
    w = DeltaFixtureWriter(tmp_path / "dl")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(80), timestamp_ms=1000)
    pipe, ledger = parts(DeltaTable(tmp_path / "dl"))
    r1 = pipe.run(spark)
    assert r1.rows_admitted == 80
    w.append(o.offset(80).limit(30), timestamp_ms=2000)
    r2 = pipe.run(spark)
    assert r2.rows_admitted == 30
    assert ledger.resume_position("orders_snap", POSITION_KEY)["snapshot_id"] == 1
    assert spark.read.parquet(str(pipe.destination.table_path)).count() == 110


def test_contract_and_quarantine_ride_the_delta(spark, tmp_path, orders, parts):
    from cdf_spark.contracts import Contract, RangeRule

    w = DeltaFixtureWriter(tmp_path / "dl2")
    o = orders.select("o_orderkey", "o_totalprice")
    w.append(o.limit(50), timestamp_ms=1000)
    pipe, _ = parts(DeltaTable(tmp_path / "dl2"))
    pipe.contract = Contract(rules=[RangeRule("o_orderkey", min=0.0, max=10.0)])
    r = pipe.run(spark)
    assert r.rows_admitted == 11  # keys 0..10
    assert r.rows_quarantined == 39
