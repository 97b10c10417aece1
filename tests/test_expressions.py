"""Expression AST, hashing, determinism gate, SQL admission, lowering."""

import pytest

from cdf_spark.expressions.ast import (
    Binary,
    Call,
    Cast,
    Col,
    Lit,
    PredicateParseError,
    parse_predicate_text,
)
from cdf_spark.expressions.determinism import DeterminismError, assert_deterministic_call
from cdf_spark.expressions.lowering import lower
from cdf_spark.expressions.sqlgate import SqlAdmissionError, analyze_project_query


def test_ast_content_hash_deterministic():
    e1 = (Col("amount") > 10) & (Col("category") == "a")
    e2 = (Col("amount") > 10) & (Col("category") == "a")
    e3 = (Col("amount") > 11) & (Col("category") == "a")
    assert e1.content_hash() == e2.content_hash()
    assert e1.content_hash() != e3.content_hash()
    assert e1.content_hash().startswith("sha256:")


def test_ast_columns():
    e = (Col("a") > 1) & (Call("upper", Col("b")) == Lit("X")) | Cast(Col("c"), "int64").is_not_null()
    assert e.columns() == {"a", "b", "c"}


def test_float_literal_identity():
    assert Lit(1.0).content_hash() != Lit(1).content_hash()  # typed identity
    assert Lit(0.1).content_hash() == Lit(0.1).content_hash()


def test_parse_predicate_text():
    e = parse_predicate_text("amount >= 10.5 AND category = 'a''b' AND active = true")
    assert isinstance(e, Binary) and e.op == "and"
    assert e.columns() == {"amount", "category", "active"}
    with pytest.raises(PredicateParseError):
        parse_predicate_text("amount BETWEEN 1 AND 2 OR x = 1")
    with pytest.raises(PredicateParseError):
        parse_predicate_text("lower(name) = 'x'")  # calls not admitted in text form


def test_determinism_gate():
    assert_deterministic_call("sha2")
    assert_deterministic_call("regexp_replace")
    with pytest.raises(DeterminismError):
        assert_deterministic_call("now")
    with pytest.raises(DeterminismError):
        assert_deterministic_call("rand")
    with pytest.raises(DeterminismError):
        assert_deterministic_call("monotonically_increasing_id")
    with pytest.raises(DeterminismError):
        assert_deterministic_call("some_unknown_fn")


def test_volatile_call_rejected_at_lowering():
    with pytest.raises(DeterminismError):
        lower(Call("rand"))


# --- SQL gate ---------------------------------------------------------------

GOOD = "SELECT id, upper(name) AS name_u FROM upstream(source => 'orders') WHERE amount > 10"


def test_sqlgate_admits_canonical_shape():
    q = analyze_project_query(GOOD)
    assert q.upstream_source == "orders"
    assert q.where_sql == "amount > 10"
    assert "upper" in q.projection_sql
    assert q.render("v") == "SELECT id , upper ( name ) AS name_u FROM v WHERE amount > 10"


def test_sqlgate_upstream_options():
    q = analyze_project_query(
        "SELECT * FROM upstream(source => 'files.orders', format => 'parquet', snapshot => '42')"
    )
    assert q.upstream_source == "files.orders"
    assert q.upstream_options == {"format": "parquet", "snapshot": "42"}


@pytest.mark.parametrize(
    "sql,code",
    [
        ("WITH x AS (SELECT 1) SELECT * FROM upstream(source => 'a')", "E_WITH"),
        ("SELECT * FROM upstream(source => 'a') JOIN b ON 1=1", "E_JOIN"),
        ("SELECT * FROM upstream(source => 'a'), b", "E_JOIN"),
        ("SELECT * FROM upstream(source => 'a') UNION SELECT * FROM b", "E_SET_OP"),
        ("SELECT a, count(1) FROM upstream(source => 'a') GROUP BY a", "E_GROUP"),
        ("SELECT DISTINCT a FROM upstream(source => 'a')", "E_GROUP"),
        ("SELECT a FROM upstream(source => 'a') ORDER BY a", "E_ORDER_LIMIT"),
        ("SELECT a FROM upstream(source => 'a') LIMIT 10", "E_ORDER_LIMIT"),
        ("SELECT row_number() OVER () FROM upstream(source => 'a')", "E_WINDOW"),
        ("SELECT (SELECT 1) FROM upstream(source => 'a')", "E_SUBQUERY"),
        ("SELECT a FROM b", "E_UPSTREAM"),
        ("UPDATE t SET a = 1", "E_SHAPE"),
    ],
)
def test_sqlgate_rejections(sql, code):
    with pytest.raises(SqlAdmissionError) as exc:
        analyze_project_query(sql)
    assert exc.value.code == code


# --- lowering against a real session ---------------------------------------


def test_lowering_filters_rows(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 15.0), (3, "a", 25.0)], ["id", "cat", "amt"]
    )
    expr = (Col("amt") > 10.0) & (Col("cat") == "a")
    out = df.filter(lower(expr)).collect()
    assert [r.id for r in out] == [3]


def test_lowering_calls_and_casts(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "cd")], ["id", "s"])
    out = (
        df.select(
            lower(Call("upper", Col("s"))).alias("u"),
            lower(Cast(Col("id"), "float64")).alias("f"),
            lower(Call("sha2", Col("s"), Lit(256))).alias("h"),
        )
        .collect()
    )
    assert out[0].u == "AB"
    assert out[0].f == 1.0
    assert len(out[0].h) == 64


def test_lowering_null_safe_ops(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "s"])
    expr = Binary("is_not_distinct_from", Col("s"), Lit(None))
    out = df.filter(lower(expr)).collect()
    assert [r.id for r in out] == [1]
