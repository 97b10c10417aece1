"""ClickHouse scan resource: negotiated pushdown SQL through the
transport seam, residual re-check, cursor-incremental rendering."""

from __future__ import annotations

from cdf_spark.expressions.ast import Col, Lit
from cdf_spark.plans.scan import ScanRequest
from cdf_spark.sources.base import ResourceDescriptor
from cdf_spark.sources.clickhouse_source import ClickHouseScanResource


class FakeTransport:
    """Returns canned rows; records the SQL the resource pushed."""

    def __init__(self, log, rows):
        self.log = log
        self.rows = rows

    def query(self, sql):
        self.log.append(sql)
        return self.rows

    def close(self):
        pass


def _resource(log, rows):
    return ClickHouseScanResource(
        ResourceDescriptor(resource_id="events_ch"),
        transport_factory=lambda: FakeTransport(log, rows),
        table="events",
        columns=["event_id", "user_id", "amount"],
    )


def test_pushdown_sql_and_execution(spark):
    log: list[str] = []
    # the server returns exactly the projected slice (2-tuples)
    src = _resource(log, [(1, 5.0), (2, 7.5)])
    req = ScanRequest(
        "events_ch",
        projection=["event_id", "amount"],
        predicates=[Col("amount") > Lit(1.0)],
        limit=100,
    )
    df, plan = src.scan(spark, req)
    assert log == ['SELECT "event_id", "amount" FROM events WHERE ("amount" > 1.0) LIMIT 100']
    assert plan.pushed and not plan.residual  # database enforces exactly
    assert df.columns == ["event_id", "amount"]
    assert df.count() == 2


def test_residual_recheck_filters_server_rows(spark):
    """Even though the plan claims Exact, residuals (when present) are
    re-applied engine-side — a lying server cannot smuggle rows."""
    log: list[str] = []
    src = _resource(log, [(1, 10, 5.0), (2, 11, 0.5)])
    plan = src.negotiate(ScanRequest("events_ch", predicates=[Col("amount") > Lit(1.0)]))
    # force the predicate residual-side to exercise the re-check path
    from cdf_spark.plans.scan import PushdownFidelity

    for p in plan.pushed:
        p.fidelity = PushdownFidelity.INEXACT
    plan.residual, plan.pushed = plan.pushed, []
    df = src.execute(spark, plan)
    assert df.count() == 1  # 0.5 row filtered engine-side


def test_cursor_incremental_render(spark):
    log: list[str] = []
    src = _resource(log, [])
    req = ScanRequest("events_ch", predicates=[Col("event_id") > Lit(41)])
    plan = src.negotiate(req)
    sql = src.render_query(plan)
    assert sql == 'SELECT * FROM events WHERE ("event_id" > 41)'
