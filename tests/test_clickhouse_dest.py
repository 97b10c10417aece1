"""ClickHouse destination (package/clickhouse_dest.py).

No ClickHouse server in the build image, so the protocol is the test
surface: a stateful fake executes exactly the statement shapes the
destination renders (CREATE/EXCHANGE/DROP, synchronous-mutation DELETE,
INSERT..SELECT, bulk inserts) against in-memory tables, and the
dispositions are asserted on resulting table CONTENTS — append grows,
replace swaps atomically, merge upserts by key. A live roundtrip runs
when CDF_SPARK_CH_DSN is set (clickhouse_driver required).
"""

from __future__ import annotations

import os
import re

import pytest

from cdf_spark.package.clickhouse_dest import (
    ClickHouseDestination,
    ClickHouseTransport,
    clickhouse_type,
)
from cdf_spark.sources.base import WriteDisposition


class FakeClickHouse:
    """Shared in-memory server state: table -> (cols, rows)."""

    def __init__(self):
        self.tables: dict[str, tuple[list[str], list[tuple]]] = {}
        self.log: list[str] = []


class FakeTransport(ClickHouseTransport):
    def __init__(self, server: FakeClickHouse):
        self.s = server

    def execute(self, sql: str):
        self.s.log.append(sql)
        s = sql.strip()
        m = re.match(r"CREATE TABLE IF NOT EXISTS `([^`]+)` \((.*)\) ENGINE", s, re.S)
        if m:
            name, cols_sql = m.group(1), m.group(2)
            cols = re.findall(r"`([^`]+)` ", cols_sql)
            self.s.tables.setdefault(name, (cols, []))
            return
        m = re.match(r"EXCHANGE TABLES `([^`]+)` AND `([^`]+)`", s)
        if m:
            a, b = m.group(1), m.group(2)
            self.s.tables[a], self.s.tables[b] = self.s.tables[b], self.s.tables[a]
            return
        m = re.match(r"DROP TABLE (?:IF EXISTS )?`([^`]+)`", s)
        if m:
            self.s.tables.pop(m.group(1), None)
            return
        m = re.match(
            r"ALTER TABLE `([^`]+)` DELETE WHERE \(([^)]+)\) IN "
            r"\(SELECT \(([^)]+)\) FROM `([^`]+)`\) SETTINGS mutations_sync = 2",
            s,
        )
        if m:
            t, keys_sql, _, stg = m.group(1), m.group(2), m.group(3), m.group(4)
            keys = [k.strip("` ") for k in keys_sql.split(",")]
            tcols, trows = self.s.tables[t]
            scols, srows = self.s.tables[stg]
            ki_t = [tcols.index(k) for k in keys]
            ki_s = [scols.index(k) for k in keys]
            staged_keys = {tuple(r[i] for i in ki_s) for r in srows}
            self.s.tables[t] = (
                tcols,
                [r for r in trows if tuple(r[i] for i in ki_t) not in staged_keys],
            )
            return
        m = re.match(r"INSERT INTO `([^`]+)` SELECT \* FROM `([^`]+)`", s)
        if m:
            t, stg = m.group(1), m.group(2)
            self.s.tables[t][1].extend(self.s.tables[stg][1])
            return
        raise AssertionError(f"fake server got unexpected SQL: {sql}")

    def insert_rows(self, table, cols, rows):
        rows = list(rows)
        tcols, trows = self.s.tables[table]
        assert cols == tcols, f"insert column order {cols} != DDL order {tcols}"
        trows.extend(rows)
        return len(rows)

    def query(self, sql: str) -> list[tuple]:
        self.s.log.append(sql)
        m = re.match(r"SELECT count\(\*\) FROM `([^`]+)`$", sql.strip())
        if m:
            return [(len(self.s.tables[m.group(1)][1]),)]
        raise AssertionError(f"fake server got unexpected query: {sql}")


@pytest.fixture()
def make_package(spark, tmp_path, sf_dir):
    from cdf_spark.package.builder import PackageBuilder

    def _make(df, name):
        return PackageBuilder(str(tmp_path / f"pkgs_{name}"), resource_id=name).build(df)

    return _make


def test_type_mapping():
    import pyarrow as pa

    assert clickhouse_type(pa.int64(), nullable=False) == "Int64"
    assert clickhouse_type(pa.int64()) == "Nullable(Int64)"
    assert clickhouse_type(pa.float64()) == "Nullable(Float64)"
    assert clickhouse_type(pa.decimal128(12, 2), nullable=False) == "Decimal(12, 2)"
    assert clickhouse_type(pa.timestamp("us")) == "Nullable(DateTime64(6))"
    assert clickhouse_type(pa.date32(), nullable=False) == "Date32"
    assert clickhouse_type(pa.string()) == "Nullable(String)"
    assert clickhouse_type(pa.binary()) == "Nullable(String)"
    assert clickhouse_type(pa.bool_()) == "Nullable(Bool)"


def test_append_and_merge_upsert_semantics(spark, make_package, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    server = FakeClickHouse()
    dest = ClickHouseDestination(
        transport_factory=lambda: FakeTransport(server),
        table="nation_tgt",
        merge_keys=["n_nationkey"],
    )
    r1 = dest.commit(spark, make_package(nation, "base"), WriteDisposition.APPEND)
    assert r1.delivery_guarantee == "at-least-once"  # honest CH append
    cols, rows = server.tables["nation_tgt"]
    assert len(rows) == 25

    # merge an updated subset: keys 0..4 with a changed name column
    from pyspark.sql import functions as F

    updated = nation.filter("n_nationkey < 5").withColumn("n_name", F.lit("UPDATED"))
    dest.commit(spark, make_package(updated, "upd"), WriteDisposition.MERGE)
    cols, rows = server.tables["nation_tgt"]
    assert len(rows) == 25  # upsert, not append
    ci = cols.index("n_name")
    ki = cols.index("n_nationkey")
    updated_rows = [r for r in rows if r[ki] < 5]
    assert len(updated_rows) == 5 and all(r[ci] == "UPDATED" for r in updated_rows)
    # no stage tables left behind
    assert set(server.tables) == {"nation_tgt"}


def test_replace_swaps_atomically_and_drops_old(spark, make_package, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    server = FakeClickHouse()
    dest = ClickHouseDestination(
        transport_factory=lambda: FakeTransport(server), table="t", merge_keys=["n_nationkey"]
    )
    dest.commit(spark, make_package(nation, "v1"), WriteDisposition.APPEND)
    dest.commit(
        spark, make_package(nation.filter("n_nationkey < 7"), "v2"), WriteDisposition.REPLACE
    )
    cols, rows = server.tables["t"]
    assert len(rows) == 7
    assert set(server.tables) == {"t"}  # old generation dropped with the stage name
    assert any(s.startswith("EXCHANGE TABLES") for s in server.log)


def test_merge_ddl_and_mutation_shapes(spark, make_package, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    server = FakeClickHouse()
    dest = ClickHouseDestination(
        transport_factory=lambda: FakeTransport(server),
        table="nation_tgt",
        merge_keys=["n_nationkey"],
    )
    dest.commit(spark, make_package(nation, "m"), WriteDisposition.MERGE)
    script = "\n".join(server.log)
    # key column bare (MergeTree ORDER BY forbids Nullable), others Nullable
    ddl = next(s for s in server.log if s.startswith("CREATE TABLE IF NOT EXISTS `nation_tgt`"))
    assert "`n_nationkey` Int32" in ddl and "Nullable" not in ddl.split(",")[0]
    assert "Nullable(String)" in ddl
    assert "ENGINE = MergeTree ORDER BY (`n_nationkey`)" in ddl
    # the delete is a synchronous mutation over the key tuple
    assert "SETTINGS mutations_sync = 2" in script
    assert "DELETE WHERE (`n_nationkey`) IN (SELECT (`n_nationkey`) FROM" in script


def test_append_verify_rowcount(spark, make_package, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    server = FakeClickHouse()
    dest = ClickHouseDestination(
        transport_factory=lambda: FakeTransport(server), table="t2", merge_keys=[]
    )
    pkg = make_package(nation, "va")
    receipt = dest.commit(spark, pkg, WriteDisposition.APPEND)
    receipt = dest.verify(spark, receipt, pkg)
    assert receipt.verified is True


def test_failed_merge_reaps_stage(spark, make_package, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    server = FakeClickHouse()

    class ExplodingTransport(FakeTransport):
        def execute(self, sql):
            if sql.startswith("ALTER TABLE"):
                raise RuntimeError("mutation rejected")
            return super().execute(sql)

    dest = ClickHouseDestination(
        transport_factory=lambda: ExplodingTransport(server),
        table="t3",
        merge_keys=["n_nationkey"],
    )
    dest.commit(spark, make_package(nation, "ok"), WriteDisposition.APPEND)
    before = list(server.tables["t3"][1])
    with pytest.raises(RuntimeError):
        dest.commit(spark, make_package(nation, "boom"), WriteDisposition.MERGE)
    assert server.tables["t3"][1] == before  # target untouched
    assert set(server.tables) == {"t3"}  # stage reaped despite the failure


@pytest.mark.skipif(
    not os.environ.get("CDF_SPARK_CH_DSN"), reason="no live ClickHouse (set CDF_SPARK_CH_DSN)"
)
def test_live_clickhouse_roundtrip(spark, make_package, sf_dir):
    from cdf_spark.package.clickhouse_dest import NativeTransport

    dsn = os.environ["CDF_SPARK_CH_DSN"]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dest = ClickHouseDestination(
        transport_factory=lambda: NativeTransport(dsn),
        table="cdf_live_nation",
        merge_keys=["n_nationkey"],
    )
    pkg = make_package(nation, "live")
    receipt = dest.commit(spark, pkg, WriteDisposition.REPLACE)
    receipt = dest.verify(spark, receipt, pkg)
    assert receipt.verified is True
    back = dest.read_back(spark, nation.columns)
    assert back.count() == 25
