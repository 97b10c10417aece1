"""Generic DB-API destination: SQLite live commit -> verify, plus
Postgres-dialect SQL rendering (no live server in this image).

Reference parity: `crates/cdf-dest-sqlite/`, `crates/cdf-dest-postgres/`
commit paths; null-safe merge shape `crates/cdf-dest-duckdb/src/commit.rs:150-216`.
"""

from __future__ import annotations

import sqlite3

import duckdb
import pytest
from pyspark.sql import types as T

from cdf_spark.package import PackageBuilder
from cdf_spark.package.dbapi_dest import (
    DUCKDB_DIALECT,
    POSTGRES,
    SQLITE,
    DbApiDestination,
)
from cdf_spark.sources.base import WriteDisposition

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType(), True), T.StructField("v", T.StringType(), True)]
)


def _sqlite_dest(db_path, table, **kw):
    return DbApiDestination(
        lambda: sqlite3.connect(str(db_path)),
        table,
        dialect=SQLITE,
        destination_uri=f"sqlite://{db_path}#{table}",
        **kw,
    )


def test_sqlite_append_and_replace(spark, tmp_path, orders):
    db = tmp_path / "t.db"
    dest = _sqlite_dest(db, "orders_t")
    builder = PackageBuilder(tmp_path / "pkgs", "orders")

    pkg = builder.build(admitted=orders.limit(100))
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg)
    assert rec.verified
    con = sqlite3.connect(str(db))
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 100

    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.APPEND), pkg)
    assert rec.verified
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 200

    # replace: multiset equality via grouped-count EXCEPT (no EXCEPT ALL)
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.REPLACE), pkg)
    assert rec.verified
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 100
    con.close()


def test_sqlite_replace_verify_catches_tamper(spark, tmp_path, orders):
    db = tmp_path / "t.db"
    dest = _sqlite_dest(db, "orders_t")
    pkg = PackageBuilder(tmp_path / "pkgs", "orders").build(admitted=orders.limit(50))
    rec = dest.commit(spark, pkg, WriteDisposition.REPLACE)
    con = sqlite3.connect(str(db))
    con.execute("DELETE FROM orders_t WHERE rowid IN (SELECT rowid FROM orders_t LIMIT 1)")
    con.commit()
    con.close()
    assert not dest.verify(spark, rec, pkg).verified


def test_sqlite_merge_null_safe(spark, tmp_path):
    """SQLite `IS` is null-safe equality: a NULL key replaces, never
    duplicates."""
    db = tmp_path / "m.db"
    dest = _sqlite_dest(db, "kv", merge_keys=["k"])
    builder = PackageBuilder(tmp_path / "pkgs", "kv")

    p1 = builder.build(admitted=spark.createDataFrame([(1, "a"), (None, "b")], SCHEMA))
    rec1 = dest.verify(spark, dest.commit(spark, p1, WriteDisposition.MERGE), p1)
    assert rec1.verified

    p2 = builder.build(admitted=spark.createDataFrame([(None, "b2"), (2, "c")], SCHEMA))
    rec2 = dest.verify(spark, dest.commit(spark, p2, WriteDisposition.MERGE), p2)
    assert rec2.verified

    con = sqlite3.connect(str(db))
    rows = dict(con.execute("SELECT k, v FROM kv").fetchall())
    con.close()
    assert rows == {1: "a", None: "b2", 2: "c"}


def test_sqlite_merge_verify_multiset_containment(spark, tmp_path):
    """Merge verify = staged multiset <= target multiset, including
    duplicate staged rows (grouped-count LEFT JOIN construction)."""
    db = tmp_path / "c.db"
    dest = _sqlite_dest(db, "kv", merge_keys=["k"])
    dup = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], SCHEMA)
    pkg = PackageBuilder(tmp_path / "pkgs", "kv").build(admitted=dup)
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.MERGE), pkg)
    assert rec.verified
    # remove ONE of the two duplicate rows: set-level compare would still
    # pass; the multiset check must fail
    con = sqlite3.connect(str(db))
    con.execute("DELETE FROM kv WHERE rowid IN (SELECT rowid FROM kv WHERE k=1 LIMIT 1)")
    con.commit()
    con.close()
    assert not dest.verify(spark, rec, pkg).verified


def test_sqlite_commit_is_transactional(spark, tmp_path):
    """A failing merge (bad key) leaves the target untouched."""
    db = tmp_path / "x.db"
    builder = PackageBuilder(tmp_path / "pkgs", "kv")
    good = _sqlite_dest(db, "kv", merge_keys=["k"])
    p1 = builder.build(admitted=spark.createDataFrame([(1, "a")], SCHEMA))
    good.commit(spark, p1, WriteDisposition.MERGE)

    bad = _sqlite_dest(db, "kv", merge_keys=["nope"])
    p2 = builder.build(admitted=spark.createDataFrame([(2, "b")], SCHEMA))
    with pytest.raises(sqlite3.OperationalError):
        bad.commit(spark, p2, WriteDisposition.MERGE)
    con = sqlite3.connect(str(db))
    assert con.execute("SELECT count(*) FROM kv").fetchone()[0] == 1
    con.close()


def test_sqlite_read_back_roundtrip(spark, tmp_path):
    db = tmp_path / "r.db"
    dest = _sqlite_dest(db, "kv")
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    pkg = PackageBuilder(tmp_path / "pkgs", "kv").build(admitted=df)
    dest.commit(spark, pkg, WriteDisposition.REPLACE)
    back = dest.read_back(spark)
    assert sorted((r.k, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_duckdb_dialect_except_all_paths(spark, tmp_path, orders):
    """The same class drives DuckDB through its EXCEPT ALL verify path —
    proving the dialect seam, not just SQLite."""
    db = str(tmp_path / "d.duckdb")
    dest = DbApiDestination(
        lambda: duckdb.connect(db),
        "orders_t",
        merge_keys=["o_orderkey"],
        dialect=DUCKDB_DIALECT,
    )
    pkg = PackageBuilder(tmp_path / "pkgs", "orders").build(admitted=orders.limit(40))
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.MERGE), pkg)
    assert rec.verified
    # re-merge the same batch: idempotent upsert, still 40 rows
    rec = dest.verify(spark, dest.commit(spark, pkg, WriteDisposition.MERGE), pkg)
    assert rec.verified
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM orders_t").fetchone()[0] == 40
    con.close()


def test_postgres_dialect_sql_rendering():
    """No live Postgres in the image: assert the dialect renders the
    reference's null-safe predicate and type DDL correctly."""
    import pyarrow as pa

    assert POSTGRES.nse("t.k", "s.k") == "t.k IS NOT DISTINCT FROM s.k"
    assert SQLITE.nse("t.k", "s.k") == "t.k IS s.k"
    assert POSTGRES.sql_type(pa.decimal128(12, 2)) == "NUMERIC(12,2)"
    assert POSTGRES.sql_type(pa.timestamp("us")) == "TIMESTAMP"
    assert POSTGRES.sql_type(pa.binary()) == "BYTEA"
    assert SQLITE.sql_type(pa.int64()) == "INTEGER"
    assert POSTGRES.placeholder == "%s"
