"""CLI verbs (python -m cdf_spark ...): command surface mirrors the
reference CLI (crates/cdf-cli-core/src/args.rs:48-68). Spark-free
verbs are tested end-to-end through main(); Spark-backed verbs reuse
the shared session via targeted function calls where needed."""

import json
import sqlite3

import pytest

from cdf_spark.__main__ import _discover, main


@pytest.fixture()
def decl(tmp_path, sf_dir):
    d = tmp_path / "cdf.toml"
    d.write_text(
        f"""
[resources.orders]
primary_key = ["o_orderkey"]
cursor = {{ field = "o_orderkey" }}

[resources.orders.source]
kind = "files"
path = "{sf_dir}/orders.parquet"
format = "parquet"

[[resources.orders.contract.rules]]
rule = "range"
column = "o_totalprice"
min = 0.0

[resources.orders.destination]
kind = "parquet"
"""
    )
    return d


def test_init_add_validate(tmp_path, capsys, sf_dir):
    assert main(["init", str(tmp_path / "proj")]) == 0
    decl = tmp_path / "proj" / "cdf.toml"
    assert decl.exists()
    # re-init without --force refuses
    assert main(["init", str(tmp_path / "proj")]) == 2
    assert (
        main(
            [
                "add",
                "orders",
                f"{sf_dir}/orders.parquet",
                "--declarations",
                str(decl),
            ]
        )
        == 0
    )
    assert "resources.orders" in decl.read_text()
    assert main(["validate", str(decl)]) == 0
    out = capsys.readouterr().out
    assert "orders\tOK" in out


def test_validate_reports_bad_resource(tmp_path, capsys):
    decl = tmp_path / "cdf.toml"
    decl.write_text(
        """
[resources.bad]
source = { kind = "frobnicate", path = "/nope" }
"""
    )
    assert main(["validate", str(decl)]) == 1
    assert "bad\tERROR" in capsys.readouterr().out


def test_plan_is_spark_free_and_negotiated(decl, tmp_path, capsys):
    rc = main(
        [
            "plan",
            str(decl),
            "orders",
            "--project",
            "o_orderkey,o_totalprice",
            "--filter",
            "o_totalprice > 1000",
            "--workspace",
            str(tmp_path / "ws"),
        ]
    )
    assert rc == 0
    plan = json.loads(capsys.readouterr().out)
    assert plan["projection"] == ["o_orderkey", "o_totalprice"]
    assert plan["pushed"], "parquet capability should push the filter"


def test_contract_and_inspect_and_state(decl, tmp_path, capsys, spark):
    from cdf_spark.declarative import Workspace

    assert main(["contract", str(decl), "orders"]) == 0
    ct = json.loads(capsys.readouterr().out)
    assert ct["hash"].startswith("sha256:") and ct["rules"]

    ws = Workspace(tmp_path / "ws")
    c = ws.compile_file(str(decl))["orders"]
    result = ws.run(spark, c)
    pkg_dir = result.package.path

    assert main(["inspect", str(pkg_dir)]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["manifest"]["package_id"] == result.package.package_id
    assert info["rows"] == result.rows_admitted

    assert main(["package", "list", "--workspace", str(tmp_path / "ws")]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert any(r["package_id"] == result.package.package_id for r in rows)

    assert main(["status", "--workspace", str(tmp_path / "ws")]) == 0
    st = json.loads(capsys.readouterr().out)
    assert "orders" in st["resources"] and st["receipts"] >= 1

    assert main(["state", "show", "orders", "--workspace", str(tmp_path / "ws")]) == 0
    entry = json.loads(capsys.readouterr().out)
    assert entry["resource_id"] == "orders"

    assert main(["state", "reset", "orders", "--workspace", str(tmp_path / "ws")]) == 0
    capsys.readouterr()
    assert main(["state", "show", "orders", "--workspace", str(tmp_path / "ws")]) == 0
    assert json.loads(capsys.readouterr().out) is None


def test_discover_dir_and_sqlite(tmp_path, sf_dir):
    found = _discover(sf_dir)
    kinds = {rid: src for rid, src in found}
    assert "orders" in kinds and kinds["orders"]["format"] == "parquet"

    db = tmp_path / "x.sqlite"
    con = sqlite3.connect(str(db))
    con.execute("CREATE TABLE t1 (a int)")
    con.execute("CREATE TABLE t2 (b int)")
    con.commit()
    con.close()
    found = _discover(str(db))
    assert [rid for rid, _ in found] == ["t1", "t2"]


def test_doctor(capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["doctor"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["workspace_writable"] and "pyspark" in rep


def test_run_backfill_explain_schema_verify(decl, tmp_path, capsys, spark):
    """Spark-backed verbs through main() — the pre-existing session is
    reused and NOT stopped (getActiveSession guard)."""
    ws = str(tmp_path / "ws")
    assert main(["run", str(decl), "orders", "--workspace", ws]) == 0
    run_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run_out["receipt_verified"] and run_out["rows_admitted"] > 0
    # session survived
    assert spark.range(1).count() == 1

    # backfill a window; frontier unmoved
    before = capsys.readouterr()
    assert (
        main(["backfill", str(decl), "orders", "--from", "100", "--to", "200", "--workspace", ws])
        == 0
    )
    bf = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert bf["rows_admitted"] > 0 and bf["window"] == [100, 200]
    assert main(["state", "show", "orders", "--workspace", ws]) == 0
    entry = json.loads(capsys.readouterr().out)
    assert entry is not None  # run's checkpoint still there, not advanced by backfill

    assert main(["explain", str(decl), "orders", "--filter", "o_orderkey > 10", "--workspace", ws]) == 0
    out = capsys.readouterr().out
    assert "negotiated" in out and ("Scan" in out or "FileScan" in out)

    assert main(["schema", str(decl), "orders", "--workspace", ws]) == 0
    sch = json.loads(capsys.readouterr().out)
    assert any(f["name"] == "o_orderkey" for f in sch["fields"])

    pkg_path = run_out["package_id"]
    # verify through the CLI using the actual path
    from cdf_spark.declarative import Workspace
    import os
    pk_root = tmp_path / "ws" / "packages"
    pdir = next(p for p in pk_root.iterdir() if (p / "manifest.json").exists())
    assert main(["package", "verify", str(pdir), "--workspace", ws]) == 0
    v = json.loads(capsys.readouterr().out)
    assert v["verified"] is True
