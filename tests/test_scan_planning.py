"""Pushdown negotiation, fidelity ledger, limit guard, file source."""

from cdf_spark.expressions.ast import Col, parse_predicate_text
from cdf_spark.plans.scan import Capability, PushdownFidelity, ScanRequest, negotiate
from cdf_spark.sources.base import ResourceDescriptor
from cdf_spark.sources.files import FileResource, pushdown_evidence


def test_negotiate_parquet_inexact_with_residual():
    req = ScanRequest(
        resource_id="orders",
        projection=["o_orderkey", "o_totalprice"],
        predicates=[Col("o_totalprice") > 1000.0],
        limit=10,
    )
    plan = negotiate(req, Capability.parquet())
    assert len(plan.pushed) == 1
    assert plan.pushed[0].fidelity is PushdownFidelity.INEXACT
    # inexact pushdown must be re-checked by the engine
    assert len(plan.residual) == 1
    # limit guard: dropped under inexact pushdown
    assert plan.limit is None and "inexact" in plan.limit_dropped_reason


def test_negotiate_exact_keeps_limit():
    req = ScanRequest("t", predicates=[Col("a") == 1], limit=5)
    plan = negotiate(req, Capability.jdbc())
    assert plan.pushed[0].fidelity is PushdownFidelity.EXACT
    assert plan.residual == []
    assert plan.limit == 5


def test_negotiate_text_format_all_residual():
    req = ScanRequest("t", predicates=[Col("a") == 1, Col("b") > 2])
    plan = negotiate(req, Capability.text_format())
    assert plan.pushed == []
    assert len(plan.unsupported) == 2


def test_complex_predicate_unsupported():
    expr = parse_predicate_text("a > 1 AND b = 'x'")  # AND-tree, not simple comparison
    plan = negotiate(ScanRequest("t", predicates=[expr]), Capability.parquet())
    assert plan.unsupported[0].expr is expr


def test_cursor_subsumption():
    req = ScanRequest(
        "t",
        predicates=[Col("id") > 100],
        cursor_field="id",
        cursor_resume_value=100,
    )
    # position-enforced source (CDC log / manifest diff): subsumed
    cap = Capability.jdbc()
    cap.position_enforced = True
    plan = negotiate(req, cap)
    assert plan.pushed[0].subsumed_by_position
    assert plan.residual == []  # subsumed: position enforces it

    # file source: position does NOT enforce the cursor; predicate stays live
    plan = negotiate(req, Capability.parquet())
    assert not plan.pushed[0].subsumed_by_position
    assert plan.residual  # inexact pushdown re-checked


def test_plan_content_hash_stable():
    req = ScanRequest("t", predicates=[Col("a") == 1], limit=5)
    p1 = negotiate(req, Capability.jdbc())
    p2 = negotiate(req, Capability.jdbc())
    assert p1.content_hash() == p2.content_hash()


def test_file_resource_scan(spark, sf_dir):
    res = FileResource(
        ResourceDescriptor(resource_id="orders"),
        f"{sf_dir}/orders.parquet",
    )
    df, plan = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey", "o_totalprice"],
            predicates=[Col("o_totalprice") > 200000.0],
        ),
    )
    assert df.columns == ["o_orderkey", "o_totalprice"]
    assert df.count() > 0
    assert df.filter("o_totalprice <= 200000").count() == 0
    assert plan.partitions.kind == "files"
    assert plan.partitions.estimated_bytes > 0
    assert plan.schema_fingerprint.startswith("sha256:")


def test_pushdown_reaches_parquet_scan(spark, sf_dir):
    """The filter and projection must reach the physical scan node."""
    res = FileResource(ResourceDescriptor(resource_id="orders"), f"{sf_dir}/orders.parquet")
    df, _ = res.scan(
        spark,
        ScanRequest(
            "orders",
            projection=["o_orderkey"],
            predicates=[Col("o_orderkey") == 1],
        ),
    )
    ev = pushdown_evidence(df)
    assert any("o_orderkey" in f for f in ev["pushed_filters"]), ev["pushed_filters"]
    assert "o_totalprice" not in (ev["read_schema"] or ""), "projection not pruned"


def test_csv_source_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    spark.createDataFrame([(1, "a"), (2, "b")], ["id", "s"]).write.option("header", True).csv(p)
    res = FileResource(
        ResourceDescriptor(resource_id="t", schema={"id": "int64", "s": "utf8"}),
        p,
        format="csv",
        header="true",
    )
    df, plan = res.scan(spark, ScanRequest("t", predicates=[Col("id") > 1]))
    assert [r.s for r in df.collect()] == ["b"]
    assert plan.unsupported and not plan.pushed  # csv: engine-only filtering
