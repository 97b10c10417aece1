"""Contract evaluation: rules, lattice, dispositions, transforms."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cdf_spark.contracts import (
    CastT,
    Contract,
    DedupRule,
    DeriveT,
    DomainRule,
    ExpandNestedT,
    FilterT,
    FreshnessRule,
    NullabilityRule,
    RangeRule,
    RedactT,
    RegexRule,
    RenameT,
    evaluate_contract,
)
from cdf_spark.contracts.evaluator import VERDICT_COL, VIOLATIONS_COL, apply_transforms
from cdf_spark.expressions.ast import Col, Lit


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 50.0, "x@y.com"),
            (2, "b", -5.0, "x@y.com"),     # range violation
            (None, "a", 10.0, "x@y.com"),  # nullability violation
            (4, "zz", 10.0, "x@y.com"),    # domain violation
            (5, "a", 10.0, "not-an-email"),  # regex violation (freeze)
        ],
        ["id", "cat", "amt", "email"],
    )


def test_rules_split_and_lattice(df):
    contract = Contract(
        rules=[
            NullabilityRule("id"),
            DomainRule("cat", ["a", "b"]),
            RangeRule("amt", min=0.0, max=100.0),
            RegexRule("email", r"^[^@]+@[^@]+$", on_violation="freeze"),
        ]
    )
    res = evaluate_contract(df, contract)
    assert res.quarantined.count() == 3
    assert res.admitted.count() == 2  # row 1 (pass) + row 5 (freeze admits)
    ann = {r.id: r for r in res.annotated.collect()}
    assert ann[1][VERDICT_COL] == "pass" and ann[1][VIOLATIONS_COL] == []
    assert ann[5][VERDICT_COL] == "freeze" and ann[5][VIOLATIONS_COL] == ["regex(email)"]
    assert ann[2][VERDICT_COL] == "quarantine"
    summary = {r.verdict: r.rows for r in res.summary().collect()}
    assert summary == {"pass": 1, "freeze": 1, "quarantine": 3}
    rules = {r.rule: r.rows for r in res.rule_summary().collect()}
    assert rules["range(amt)"] == 1 and rules["nullability(id)"] == 1


def test_multiple_violations_take_lattice_max(spark):
    df = spark.createDataFrame([(None, "bad@")], "id long, email string")
    contract = Contract(
        rules=[
            NullabilityRule("id", on_violation="quarantine"),
            RegexRule("email", r"^[^@]+@[^@]+$", on_violation="freeze"),
        ]
    )
    row = evaluate_contract(df, contract).annotated.collect()[0]
    assert row[VERDICT_COL] == "quarantine"
    assert set(row[VIOLATIONS_COL]) == {"nullability(id)", "regex(email)"}


def test_freshness_rule_needs_as_of(spark):
    df = spark.createDataFrame(
        [(1, datetime(2026, 8, 10, tzinfo=timezone.utc)), (2, datetime(2026, 8, 1, tzinfo=timezone.utc))],
        ["id", "ts"],
    )
    contract = Contract(rules=[FreshnessRule("ts", max_age_ms=5 * 86_400_000)])
    with pytest.raises(ValueError):
        evaluate_contract(df, contract)
    res = evaluate_contract(df, contract, as_of=datetime(2026, 8, 12, tzinfo=timezone.utc))
    assert res.quarantined.count() == 0
    assert res.annotated.filter(F.col(VERDICT_COL) == "freeze").count() == 1


def test_dedup_fail_rule(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    contract = Contract(rules=[DedupRule(keys=["k"], keep="fail")])
    res = evaluate_contract(df, contract)
    assert res.quarantined.count() == 2  # both rows of the duplicate key
    assert res.admitted.count() == 1


def test_transforms_chain(spark):
    df = spark.createDataFrame([(1, "secret", "5")], ["id", "pii", "n"])
    contract = Contract(
        transforms=[
            RenameT("n", "qty"),
            CastT("qty", "int64"),
            RedactT("pii", mode="hash"),
            DeriveT("qty2", (Col("qty") * Lit(2))),
            FilterT(Col("qty2") > 5),
        ]
    )
    out, children = apply_transforms(df, contract)
    row = out.collect()[0]
    assert row.qty == 5 and row.qty2 == 10
    assert len(row.pii) == 64 and row.pii != "secret"
    assert children == []


def test_redact_mask_and_omit(spark):
    df = spark.createDataFrame([(1, "x", "y")], ["id", "a", "b"])
    out, _ = apply_transforms(
        df, Contract(transforms=[RedactT("a", mode="mask", replacement="##"), RedactT("b", mode="omit")])
    )
    assert out.columns == ["id", "a"]
    assert out.collect()[0].a == "##"


def test_expand_nested_child_table(spark):
    df = spark.createDataFrame(
        [(1, [{"sku": "s1", "qty": 2}, {"sku": "s2", "qty": 3}]), (2, None)],
        "id long, items array<struct<sku: string, qty: long>>",
    )
    out, children = apply_transforms(
        df, Contract(transforms=[ExpandNestedT("items", parent_keys=["id"])])
    )
    assert "items" not in out.columns
    child = children[0]
    rows = child.orderBy("id", "_cdf_load_order").collect()
    assert [(r.id, r._cdf_load_order, r.sku) for r in rows if r.sku] == [
        (1, 0, "s1"),
        (1, 1, "s2"),
    ]


def test_contract_hash_stable():
    c1 = Contract(rules=[RangeRule("a", min=0, max=1)])
    c2 = Contract(rules=[RangeRule("a", min=0, max=1)])
    c3 = Contract(rules=[RangeRule("a", min=0, max=2)])
    assert c1.content_hash() == c2.content_hash() != c3.content_hash()


def test_strict_cast_quarantines_instead_of_aborting(spark):
    """Under ANSI a plain cast would crash the job on 'oops'; the
    contract semantics are per-row: failed casts quarantine."""
    df = spark.createDataFrame([(1, "10"), (2, "oops"), (3, None)], "id long, n string")
    contract = Contract(transforms=[CastT("n", "int64", lossy_allowed=False)])
    res = evaluate_contract(df, contract)
    assert res.quarantined.count() == 1
    assert res.quarantined.collect()[0].id == 2
    assert "cast(n)" in res.quarantined.collect()[0]._cdf_violations
    adm = {r.id: r.n for r in res.admitted.collect()}
    assert adm == {1: 10, 3: None}  # null source is not a cast failure
    assert "_cdf_castfail_n" not in res.annotated.columns


def test_lossy_cast_nulls_silently(spark):
    df = spark.createDataFrame([(1, "10"), (2, "oops")], "id long, n string")
    contract = Contract(transforms=[CastT("n", "int64", lossy_allowed=True)])
    res = evaluate_contract(df, contract)
    assert res.quarantined.count() == 0
    assert {r.id: r.n for r in res.admitted.collect()} == {1: 10, 2: None}


def test_expr_rule_cross_field(spark):
    """ExprRule disposes rows by a typed-AST cross-field predicate:
    true admits, false or null quarantines (a predicate that cannot
    be proven true admits nothing)."""
    from cdf_spark.contracts import Contract, ExprRule
    from cdf_spark.contracts.evaluator import evaluate_contract
    from cdf_spark.expressions.ast import Col

    df = spark.createDataFrame(
        [(1, 10.0, 5.0), (2, 3.0, 5.0), (3, None, 5.0), (4, 9.0, None)],
        "id long, a double, b double",
    )
    c = Contract(rules=[ExprRule(predicate=Col("a") > Col("b"), label="a_gt_b")])
    res = evaluate_contract(df, c)
    assert {r.id for r in res.admitted.collect()} == {1}
    assert {r.id for r in res.quarantined.collect()} == {2, 3, 4}
    # plan identity: the rule serializes with its AST (content hash)
    assert "ExprRule" in str(c.to_json_obj() if hasattr(c, "to_json_obj") else c.rules[0].to_json_obj())
