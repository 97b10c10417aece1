"""ClickHouse table scans over the native-protocol transport seam.

Completes the ClickHouse pairing (destination:
`package/clickhouse_dest.py`) on the source side, re-expressing the
reference's ClickHouse resource
(`crates/cdf-source-clickhouse/src/resource.rs:254-300`): negotiated
projection/predicate/order/limit pushdown rendered to SQL the server
enforces exactly, executed through `ClickHouseTransport.query` — the
same seam the destination uses, so the live path binds to
`clickhouse_driver` when present and tests run against fakes.

ClickHouse accepts ANSI double-quoted identifiers, so SQL rendering is
shared verbatim with the JDBC/DB-API sources (`jdbc.render_query`) and
plan artifacts stay identical across engines. Like those sources, the
fetch is a single driver-side batch: ClickHouse parallelizes the query
server-side, and only the selected slice crosses the wire. Cluster-
scale parallel ingest would shard by a key range over multiple
transports — the JdbcPartitionSpec shape — without changing
negotiation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..plans.scan import ScanPlan, ScanRequest, negotiate
from .base import ResourceDescriptor
from .jdbc import JdbcResource


class ClickHouseScanResource:
    """A ClickHouse table scanned through a transport factory.

    ``transport_factory`` returns a `ClickHouseTransport`
    (`package/clickhouse_dest.NativeTransport` for a live server, a
    fake in tests). ``columns`` names the result columns — ClickHouse
    clients return bare tuples; with a projection pushed down, the plan
    itself fixes the order.
    """

    def __init__(
        self,
        descriptor: ResourceDescriptor,
        transport_factory: Callable[[], object],
        table: str,
        columns: list[str],
    ):
        self.descriptor = descriptor
        self.transport_factory = transport_factory
        self.table = table
        self.columns = columns
        self._renderer = JdbcResource(descriptor, url="clickhouse://", table=table)

    def capabilities(self):
        return self._renderer.capabilities()

    def negotiate(self, request: ScanRequest) -> ScanPlan:
        return negotiate(request, self.capabilities())

    def render_query(self, plan: ScanPlan) -> str:
        return self._renderer.render_query(plan)

    def execute(self, spark: SparkSession, plan: ScanPlan) -> DataFrame:
        query = self.render_query(plan)
        tr = self.transport_factory()
        try:
            rows = tr.query(query)
        finally:
            tr.close()
        cols = list(plan.projection) if plan.projection else list(self.columns)
        df = spark.createDataFrame([tuple(r) for r in rows], schema=cols)
        from ..expressions.lowering import lower

        for p in plan.residual:
            df = df.filter(lower(p.expr))
        return df

    def scan(self, spark: SparkSession, request: ScanRequest) -> tuple[DataFrame, ScanPlan]:
        plan = self.negotiate(request)
        return self.execute(spark, plan), plan
