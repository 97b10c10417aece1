"""DB-API source: negotiated pushdown executed against live engines
(DuckDB + SQLite), validating what jdbc.py can only render in this
image (`crates/cdf-source-sqlite/src/source.rs:276-330` behavior)."""

from __future__ import annotations

import sqlite3

import duckdb
import pytest

from cdf_spark.expressions.ast import Col
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources import DbApiResource, ResourceDescriptor
from cdf_spark.sources.base import CursorSpec


@pytest.fixture(scope="module")
def duck_db(tmp_path_factory, spark, sf_dir):
    path = str(tmp_path_factory.mktemp("duck") / "src.duckdb")
    con = duckdb.connect(path)
    con.execute(f"CREATE TABLE orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')")
    con.close()
    return path


def test_duckdb_pushdown_projection_predicate(spark, duck_db):
    res = DbApiResource(
        ResourceDescriptor(resource_id="orders_db"),
        connect=lambda: duckdb.connect(duck_db, read_only=True),
        table="orders",
    )
    df, plan = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey", "o_totalprice"],
            predicates=[Col("o_totalprice") > 100000.0],
        ),
    )
    assert plan.residual == []  # database enforces exactly
    assert [f.name for f in df.schema.fields] == ["o_orderkey", "o_totalprice"]
    # the database did the filtering, not Spark
    con = duckdb.connect(duck_db, read_only=True)
    expect = con.execute("SELECT count(*) FROM orders WHERE o_totalprice > 100000.0").fetchone()[0]
    con.close()
    assert df.count() == expect > 0
    assert "WHERE" in res.render_query(plan)


def test_duckdb_order_limit_pushdown(spark, duck_db):
    from cdf_spark.plans.scan import OrderBy

    res = DbApiResource(
        ResourceDescriptor(resource_id="orders_db"),
        connect=lambda: duckdb.connect(duck_db, read_only=True),
        table="orders",
    )
    df, plan = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey"],
            order_by=[OrderBy("o_orderkey", ascending=False)],
            limit=7,
        ),
    )
    sql = res.render_query(plan)
    assert "ORDER BY" in sql and "LIMIT 7" in sql
    got = [r.o_orderkey for r in df.collect()]
    assert len(got) == 7
    assert got == sorted(got, reverse=True)


def test_duckdb_cursor_incremental(spark, duck_db):
    """Cursor resume renders into the pushed query: the second read
    starts past the frontier, enforced by the database."""
    desc = ResourceDescriptor(resource_id="orders_db", cursor=CursorSpec("o_orderkey"))
    res = DbApiResource(
        desc, connect=lambda: duckdb.connect(duck_db, read_only=True), table="orders"
    )
    df_all, _ = res.scan(spark, ScanRequest("orders", projection=["o_orderkey"]))
    frontier = df_all.agg({"o_orderkey": "max"}).collect()[0][0]

    df2, plan2 = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey"],
            predicates=[Col("o_orderkey") > frontier],
            cursor_field="o_orderkey",
            cursor_resume_value=frontier,
        ),
    )
    assert df2.count() == 0
    assert f"> {frontier}" in res.render_query(plan2)


def test_sqlite_row_path(spark, tmp_path):
    """SQLite via the non-Arrow row path: same negotiation, same SQL."""
    db = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE kv (k INTEGER, v TEXT)")
    con.executemany("INSERT INTO kv VALUES (?, ?)", [(i, f"r{i}") for i in range(20)])
    con.commit()
    con.close()

    res = DbApiResource(
        ResourceDescriptor(resource_id="kv"),
        connect=lambda: sqlite3.connect(db),
        table="kv",
        arrow=False,
    )
    df, plan = res.scan(
        spark, ScanRequest("kv", projection=["k", "v"], predicates=[Col("k") >= 15])
    )
    assert plan.residual == []
    rows = {r.k for r in df.collect()}
    assert rows == {15, 16, 17, 18, 19}
