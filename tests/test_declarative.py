"""Declarative layer: TOML -> compiled artifacts -> pipeline runs."""

import json

import pytest

from cdf_spark.declarative import DeclarationError, Workspace

DECL = """
[resources.orders]
primary_key = ["o_orderkey"]
write_disposition = "merge"
cursor = { field = "o_orderkey" }
dedup = { keys = ["o_orderkey"], keep = "last" }

[resources.orders.source]
kind = "files"
path = "{SF}/orders.parquet"
format = "parquet"

[[resources.orders.contract.rules]]
rule = "range"
column = "o_totalprice"
min = 0.0

[[resources.orders.contract.rules]]
rule = "domain"
column = "o_orderstatus"
allowed = ["O", "F", "P"]

[[resources.orders.contract.transforms]]
transform = "derive"
column = "is_big"
expression = "o_totalprice > 200000"

[resources.orders.destination]
kind = "parquet"
"""


def test_compile_and_run(spark, tmp_path, sf_dir):
    decl_path = tmp_path / "cdf.toml"
    decl_path.write_text(DECL.replace("{SF}", sf_dir))
    ws = Workspace(tmp_path / "ws")
    compiled = ws.compile_file(decl_path)
    assert set(compiled) == {"orders"}
    c = compiled["orders"]
    assert c.artifact_hash.startswith("sha256:")
    artifacts = list((tmp_path / "ws" / "compiled").glob("orders@*.json"))
    assert len(artifacts) == 1
    stored = json.loads(artifacts[0].read_text())
    assert stored["declaration"]["primary_key"] == ["o_orderkey"]

    # idempotent compile -> same hash
    assert ws.compile_file(decl_path)["orders"].artifact_hash == c.artifact_hash

    result = ws.run(spark, c)
    assert result.rows_admitted > 0
    assert result.receipt.verified
    out = spark.read.parquet(str(tmp_path / "ws" / "warehouse" / "orders"))
    assert "is_big" in out.columns
    assert out.count() == result.rows_admitted

    # incremental second run: cursor resumed from ledger
    assert ws.run(spark, c).rows_admitted == 0


def test_compile_rejects_unknown_rule(tmp_path):
    ws = Workspace(tmp_path)
    with pytest.raises(DeclarationError):
        ws.compile("x", {"contract": {"rules": [{"rule": "frobnicate", "column": "a"}]}})


def test_compile_rejects_bad_expression(tmp_path):
    ws = Workspace(tmp_path)
    with pytest.raises(Exception):
        ws.compile(
            "x",
            {"contract": {"transforms": [{"transform": "filter", "expression": "DROP TABLE x"}]}},
        )


def test_cli_compile_and_sql(tmp_path, sf_dir, capsys):
    from cdf_spark.__main__ import main

    decl_path = tmp_path / "cdf.toml"
    decl_path.write_text(DECL.replace("{SF}", sf_dir))
    rc = main(["compile", str(decl_path), "--workspace", str(tmp_path / "ws")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "orders\tsha256:" in out


STREAM_DECL = """
[resources.ev]
primary_key = ["event_id"]
schema = { event_id = "int64", seq = "int64", value = "float64" }

[resources.ev.source]
kind = "files"
path = "{SRC}/*"
format = "parquet"

[resources.ev.stream]
extent = "drain"
watermark = { column = "seq", delay = 20 }
late_action = "quarantine"

[[resources.ev.contract.rules]]
rule = "range"
column = "value"
min = 0.0

[resources.ev.destination]
kind = "parquet"
"""


def test_declarative_streaming_drain(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    spark.createDataFrame(
        [(i, i * 10, float(i)) for i in range(1, 11)],
        "event_id long, seq long, value double",
    ).coalesce(1).write.parquet(str(src / "b1"))

    decl = tmp_path / "cdf.toml"
    decl.write_text(STREAM_DECL.replace("{SRC}", str(src)))
    ws = Workspace(tmp_path / "ws")
    compiled = ws.compile_file(decl)["ev"]
    epochs = ws.run(spark, compiled)
    assert len(epochs) == 1
    assert epochs[0].rows_admitted == 10
    assert epochs[0].receipt_verified
    assert epochs[0].watermark_after == 80  # max(seq)=100 - 20

    out = spark.read.parquet(str(tmp_path / "ws" / "warehouse" / "ev"))
    assert out.count() == 10


def test_destination_kind_iceberg(spark, tmp_path, sf_dir):
    """A TOML resource can land in an open-table destination: kind =
    'iceberg' routes through IcebergDestination and the committed
    table resolves with any Iceberg reader."""
    from cdf_spark.declarative import Workspace
    from cdf_spark.sources.iceberg import IcebergTable

    ws = Workspace(tmp_path / "ws")
    toml = f"""
[resources.orders_ice]
[resources.orders_ice.source]
kind = "files"
path = "{sf_dir}/orders.parquet"
format = "parquet"
[resources.orders_ice.destination]
kind = "iceberg"
path = "{tmp_path}/ws/warehouse/orders_ice"
"""
    p = tmp_path / "cdf.toml"
    p.write_text(toml)
    compiled = ws.compile_file(str(p))
    result = ws.run(spark, compiled["orders_ice"])
    assert result.receipt is not None and result.receipt.verified
    t = IcebergTable(tmp_path / "ws" / "warehouse" / "orders_ice")
    assert t.read(spark).count() == result.rows_admitted


def test_destination_kind_iceberg_partitioned_by_transform(spark, tmp_path, sf_dir):
    """TOML partition_by with a transform array seeds the created
    table's spec (bucket via the spec murmur3); the committed table
    prunes on the bucketed column, and a second run rehydrates the
    existing spec instead of redeclaring it."""
    from cdf_spark.declarative import Workspace
    from cdf_spark.expressions.ast import Binary, Col, Lit
    from cdf_spark.sources.iceberg import IcebergTable

    ws = Workspace(tmp_path / "ws")
    toml = f"""
[resources.orders_b]
[resources.orders_b.source]
kind = "files"
path = "{sf_dir}/orders.parquet"
format = "parquet"
[resources.orders_b.destination]
kind = "iceberg"
path = "{tmp_path}/ws/warehouse/orders_b"
partition_by = [["bucket", 4, "o_custkey"]]
"""
    p = tmp_path / "cdf.toml"
    p.write_text(toml)
    compiled = ws.compile_file(str(p))
    result = ws.run(spark, compiled["orders_b"])
    assert result.receipt is not None and result.receipt.verified
    t = IcebergTable(tmp_path / "ws" / "warehouse" / "orders_b")
    spec = t.metadata["partition-specs"][0]["fields"]
    assert [f["transform"] for f in spec] == ["bucket[4]"]
    key = t.read(spark).select("o_custkey").first()[0]
    kept, ev = t.data_files_pruned(
        int(t.metadata["current-snapshot-id"]), [Binary("eq", Col("o_custkey"), Lit(key))]
    )
    assert ev["files_pruned"] > 0
    assert spark.read.parquet(*kept).filter(f"o_custkey = {key}").count() > 0


def test_destination_kind_unknown_refuses(tmp_path, sf_dir):
    from cdf_spark.declarative import DeclarationError, Workspace

    ws = Workspace(tmp_path / "ws")
    toml = f"""
[resources.x]
[resources.x.source]
kind = "files"
path = "{sf_dir}/orders.parquet"
[resources.x.destination]
kind = "mystery"
"""
    p = tmp_path / "cdf.toml"
    p.write_text(toml)
    compiled = ws.compile_file(str(p))
    import pytest as _pytest

    with _pytest.raises(DeclarationError, match="unknown destination kind"):
        compiled["x"].pipeline(tmp_path / "ws")


def test_destination_stage_branch_wap(spark, tmp_path, sf_dir):
    """TOML stage_branch: the first declarative run creates the table
    on main (an empty table has nothing to fork from), the second
    STAGES on the audit branch and publishes only through verify —
    the branch ref exists, the receipt names the branch destination,
    and the published table carries both runs' rows."""
    from cdf_spark.declarative import Workspace
    from cdf_spark.sources.iceberg import IcebergTable

    ws = Workspace(tmp_path / "ws")
    toml = f"""
[resources.orders_wap]
[resources.orders_wap.source]
kind = "files"
path = "{sf_dir}/orders.parquet"
format = "parquet"
[resources.orders_wap.destination]
kind = "iceberg"
path = "{tmp_path}/ws/warehouse/orders_wap"
stage_branch = "audit"
"""
    p = tmp_path / "cdf.toml"
    p.write_text(toml)
    compiled = ws.compile_file(str(p))
    r1 = ws.run(spark, compiled["orders_wap"])
    assert r1.receipt.verified and r1.rows_admitted > 0
    t = IcebergTable(tmp_path / "ws" / "warehouse" / "orders_wap")
    assert t.read(spark).count() == r1.rows_admitted

    r2 = ws.run(spark, compiled["orders_wap"])  # full re-load, STAGED
    assert r2.receipt.verified
    assert r2.receipt.destination.endswith("@audit")
    t2 = IcebergTable(tmp_path / "ws" / "warehouse" / "orders_wap")
    assert t2.read(spark).count() == r1.rows_admitted + r2.rows_admitted
    refs = {r.name for r in t2.metadata_table(spark, "refs").collect()}
    assert "audit" in refs
