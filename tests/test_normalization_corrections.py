"""Normalization, reconciliation, corrections, compressed formats."""

import json

import pytest

from cdf_spark.contracts import Contract, RangeRule, evaluate_contract
from cdf_spark.contracts.normalization import IdentifierPolicy, normalize_columns, normalize_identifier
from cdf_spark.contracts.reconciliation import Reconciliation, ReconciliationError, reconcile_contract_result
from cdf_spark.package.correction import CorrectionSpec, apply_correction


def test_normalize_identifier_rules():
    p = IdentifierPolicy()
    assert normalize_identifier("CamelCaseCol", p) == "camel_case_col"
    assert normalize_identifier("weird col-name!", p) == "weird_col_name_"
    assert normalize_identifier("9lives", p) == "_9lives"
    assert normalize_identifier("select", p) == "select_"
    assert normalize_identifier("nested.field.name", p) == "nested__field__name"
    long = "x" * 100
    assert len(normalize_identifier(long, p)) == 63


def test_normalize_collision_handling():
    p = IdentifierPolicy()
    taken: set[str] = set()
    a = normalize_identifier("My Col", p, taken)
    b = normalize_identifier("my-col", p, taken)
    c = normalize_identifier("my_col", p, taken)
    assert a == "my_col" and b == "my_col_1" and c == "my_col_2"


def test_normalize_columns_dataframe(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["UserId", "user id", "order"])
    res = normalize_columns(df)
    assert res.df.columns == ["user_id", "user_id_1", "order_"]
    assert res.mapping["UserId"] == "user_id"


def test_reconciliation_balance(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    contract = Contract(rules=[RangeRule("v", min=0.0, max=5.0)])
    res = evaluate_contract(df, contract)
    rec = reconcile_contract_result(10, res)
    assert rec.balanced
    assert rec.splits == {"admitted": 6, "quarantined": 4}

    with pytest.raises(ReconciliationError):
        Reconciliation(10).record("admitted", 4).record("quarantined", 3).assert_balanced()


@pytest.fixture()
def committed_table(spark, tmp_path):
    path = tmp_path / "table"
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    ).write.parquet(str(path))
    return path


def test_correction_retract(spark, committed_table, tmp_path):
    spec = CorrectionSpec(kind="retract", keys=["k"], key_values=[{"k": 2}, {"k": 4}])
    receipt = apply_correction(spark, committed_table, spec, ledger_root=tmp_path / "ledger")
    assert receipt.rows_affected == 2
    left = {r.k for r in spark.read.parquet(str(committed_table)).collect()}
    assert left == {1, 3}
    log = (tmp_path / "ledger" / "corrections.jsonl").read_text().strip()
    assert json.loads(log)["kind"] == "retract"


def test_correction_amend(spark, committed_table):
    spec = CorrectionSpec(kind="amend", keys=["k"], key_values=[{"k": 3}], amendments={"v": 99.0})
    receipt = apply_correction(spark, committed_table, spec)
    assert receipt.rows_affected == 1
    rows = {r.k: r.v for r in spark.read.parquet(str(committed_table)).collect()}
    assert rows[3] == 99.0 and rows[1] == 10.0


def test_correction_reinstate(spark, committed_table):
    extra = spark.createDataFrame([(9, "z", 90.0)], "k long, name string, v double")
    spec = CorrectionSpec(kind="reinstate", keys=["k"])
    receipt = apply_correction(spark, committed_table, spec, reinstate_df=extra)
    assert receipt.rows_affected == 1
    assert spark.read.parquet(str(committed_table)).count() == 5


def test_compressed_ndjson_read(spark, tmp_path):
    """Byte-transform parity: Spark's codec layer decompresses gzip
    transparently (reference: crates/cdf-transform-*)."""
    import gzip

    p = tmp_path / "data.ndjson.gz"
    with gzip.open(p, "wt") as f:
        for i in range(5):
            f.write(json.dumps({"id": i, "v": f"r{i}"}) + "\n")
    df = spark.read.json(str(p))
    assert df.count() == 5
    assert sorted(r.id for r in df.collect()) == [0, 1, 2, 3, 4]
