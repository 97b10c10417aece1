"""Format gating, Arrow IPC bridge, CDC log epochs."""

import pytest
from pyspark.sql import functions as F

from cdf_spark.sources.cdc import CdcLogSource
from cdf_spark.sources.formats import (
    FormatUnavailable,
    read_arrow_ipc,
    require_format,
    write_arrow_ipc,
)


def test_require_format_builtins(spark):
    for fmt in ("parquet", "csv", "json", "arrow-ipc"):
        require_format(spark, fmt)
    with pytest.raises(FormatUnavailable):
        require_format(spark, "flatbuffers")


def test_avro_available_without_jar(spark):
    # round 2: avro decodes jar-free via sources/avro_format.py
    require_format(spark, "avro")


def test_arrow_ipc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 2.5), (2, "b", 3.5)], "id long, s string, v double")
    p = str(tmp_path / "t.arrow")
    n = write_arrow_ipc(df, p)
    assert n == 2
    back = read_arrow_ipc(spark, p)
    assert back.schema == df.schema
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [(1, "a", 2.5), (2, "b", 3.5)]


@pytest.fixture()
def cdc_log(spark, tmp_path):
    rows = [
        # txid 1: insert k1, k2
        (1, 1, 1, "insert", "v1a"),
        (2, 1, 2, "insert", "v2a"),
        # txid 2: update k1 twice (last wins), delete k2
        (1, 2, 1, "update", "v1b"),
        (1, 2, 2, "update", "v1c"),
        (2, 2, 3, "delete", None),
        # txid 3: insert k3
        (3, 3, 1, "insert", "v3a"),
    ]
    df = spark.createDataFrame(rows, "k long, txid long, seq long, op string, v string")
    path = str(tmp_path / "log")
    df.write.parquet(path)
    return CdcLogSource(path, keys=["k"])


def test_cdc_epoch_planning_whole_transactions(spark, cdc_log):
    plan = cdc_log.plan_epoch(spark, resume_txid=None, max_txns=2)
    assert plan.txn_count == 2 and plan.to_txid_inclusive == 2
    epoch = cdc_log.read_epoch(spark, plan)
    # whole transactions: all 5 rows of txid 1..2, none of txid 3
    assert epoch.count() == 5
    assert epoch.agg(F.max("txid")).collect()[0][0] == 2


def test_cdc_apply_epochs_in_order(spark, cdc_log):
    target = spark.createDataFrame([], "k long, v string")

    plan1 = cdc_log.plan_epoch(spark, None, max_txns=2)
    target = cdc_log.apply_epoch(spark, target, plan1, payload_cols=["v"])
    state = {r.k: r.v for r in target.collect()}
    # k1 updated to v1c (seq order within txn), k2 deleted
    assert state == {1: "v1c"}

    plan2 = cdc_log.plan_epoch(spark, plan1.to_txid_inclusive)
    target = cdc_log.apply_epoch(spark, target, plan2, payload_cols=["v"])
    state = {r.k: r.v for r in target.collect()}
    assert state == {1: "v1c", 3: "v3a"}

    # frontier reached: no further epochs
    assert cdc_log.plan_epoch(spark, plan2.to_txid_inclusive) is None


def test_cdc_resume_is_exclusive(spark, cdc_log):
    plan = cdc_log.plan_epoch(spark, resume_txid=1)
    assert plan.from_txid_exclusive == 1 and plan.to_txid_inclusive == 3
    assert cdc_log.read_epoch(spark, plan).filter("txid = 1").count() == 0
