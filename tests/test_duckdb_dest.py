"""DuckDB destination: commit -> verify protocol against a real
database file (reference: `crates/cdf-dest-duckdb/src/commit.rs:150-216`,
null-safe predicate `sql.rs:55-62`)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from cdf_spark.package import DuckDbDestination, PackageBuilder
from cdf_spark.runtime import LoadPipeline
from cdf_spark.sources import FileResource, ResourceDescriptor
from cdf_spark.sources.base import WriteDisposition

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType(), True), T.StructField("v", T.StringType(), True)]
)


def test_duckdb_append_and_replace(spark, tmp_path, orders):
    db = tmp_path / "t.duckdb"
    dest = DuckDbDestination(db, "orders_t")
    builder = PackageBuilder(tmp_path / "pkgs", "orders")

    pkg = builder.build(admitted=orders.limit(100))
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg)
    assert rec.verified
    con = duckdb.connect(str(db))
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 100

    # append again: at-least-once, rows accumulate
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg)
    assert rec.verified
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 200

    # replace: exact multiset equality with the package
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.REPLACE), pkg)
    assert rec.verified
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 100
    con.close()


def test_duckdb_merge_null_safe(spark, tmp_path):
    """DELETE..USING with IS NOT DISTINCT FROM: NULL keys replace, not
    duplicate."""
    db = tmp_path / "m.duckdb"
    dest = DuckDbDestination(db, "kv", merge_keys=["k"])
    builder = PackageBuilder(tmp_path / "pkgs", "kv")

    p1 = builder.build(admitted=spark.createDataFrame([(1, "a"), (None, "b")], SCHEMA))
    rec1 = dest.verify(spark, dest.commit(spark, p1, WriteDisposition.MERGE), p1)
    assert rec1.verified

    p2 = builder.build(admitted=spark.createDataFrame([(None, "b2"), (2, "c")], SCHEMA))
    rec2 = dest.verify(spark, dest.commit(spark, p2, WriteDisposition.MERGE), p2)
    assert rec2.verified

    con = duckdb.connect(str(db))
    rows = dict(con.execute("SELECT k, v FROM kv").fetchall())
    con.close()
    assert rows == {1: "a", None: "b2", 2: "c"}


def test_duckdb_merge_is_transactional(spark, tmp_path):
    """A failing merge must leave the table untouched (single DuckDB
    transaction: the delete rolls back with the failed insert)."""
    db = tmp_path / "tx.duckdb"
    dest = DuckDbDestination(db, "kv", merge_keys=["k"])
    builder = PackageBuilder(tmp_path / "pkgs", "kv")
    p1 = builder.build(admitted=spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    dest.commit(spark, p1, WriteDisposition.MERGE)

    # sabotage: incompatible schema in the staged batch -> insert fails
    bad_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("other", T.ArrayType(T.LongType()))]
    )
    p_bad = builder.build(admitted=spark.createDataFrame([(1, [1, 2])], bad_schema))
    with pytest.raises(Exception):
        dest.commit(spark, p_bad, WriteDisposition.MERGE)

    con = duckdb.connect(str(db))
    rows = dict(con.execute("SELECT k, v FROM kv").fetchall())
    con.close()
    assert rows == {1: "a", 2: "b"}  # delete rolled back with the insert


def test_pipeline_into_duckdb(spark, tmp_path, sf_dir):
    """LoadPipeline end-to-end with a database destination: the
    checkpoint advances only after the DuckDB receipt verifies."""
    from cdf_spark.package import CheckpointLedger
    from cdf_spark.sources.base import CursorSpec

    desc = ResourceDescriptor(
        resource_id="orders_ddb",
        primary_key=["o_orderkey"],
        cursor=CursorSpec("o_orderkey"),
    )
    ledger = CheckpointLedger(tmp_path / "ledger")
    dest = DuckDbDestination(tmp_path / "dest.duckdb", "orders", merge_keys=["o_orderkey"])
    pipe = LoadPipeline(
        resource=FileResource(desc, f"{sf_dir}/orders.parquet"),
        package_root=str(tmp_path / "pkgs"),
        ledger=ledger,
        destination=dest,
        disposition=WriteDisposition.MERGE,
    )
    r1 = pipe.run(spark)
    assert r1.receipt.verified and r1.rows_admitted > 0
    assert ledger.latest("orders_ddb") is not None

    # idempotent re-run: cursor resumes, zero new rows, table unchanged
    r2 = pipe.run(spark)
    assert r2.rows_admitted == 0
    con = duckdb.connect(str(tmp_path / "dest.duckdb"))
    assert con.execute("SELECT count(*) FROM orders").fetchone()[0] == r1.rows_admitted
    con.close()

    # read back through Spark: row-for-row what was admitted
    assert dest.read_back(spark).count() == r1.rows_admitted
