"""DB-API database sources: live pushdown execution without JDBC jars.

The JDBC path (`jdbc.py`) renders negotiated pushdown SQL but needs a
driver jar + a server to run against. DuckDB and SQLite are in-process
engines whose Python DB-API connections are available in this image, so
this module executes the SAME negotiated plan (same `negotiate`, same
`render_query`) against a live database — validating the pushdown
claims end-to-end the way the reference's SQLite source does
(`crates/cdf-source-sqlite/src/source.rs:276-330`; Postgres negotiation
behavior `crates/cdf-source-postgres/src/source.rs:373-430`).

Execution shape and scale honesty: DuckDB/SQLite are single-process
databases — there is no server-side parallelism to exploit, so the
fetch is one Arrow batch (DuckDB) or one row batch (SQLite) on the
driver, exactly like the reference's single-connection sources. The
database enforces projection + predicates + order/limit (Exact
fidelity), so only the SELECTED slice crosses the boundary. For
server databases at cluster scale, use `JdbcResource` with partitioned
range reads; the negotiation layer is shared.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from .base import ResourceDescriptor
from .jdbc import JdbcResource


class DbApiResource:
    """A database resource executed over a Python DB-API connection.

    ``connect`` returns a fresh connection per scan (duckdb.connect,
    sqlite3.connect, ...). SQL rendering is shared with JdbcResource so
    plan artifacts are identical across the two execution paths.
    """

    def __init__(
        self,
        descriptor: ResourceDescriptor,
        connect: Callable[[], object],
        table: str,
        arrow: bool = True,
    ):
        self.descriptor = descriptor
        self.connect = connect
        self.table = table
        self.arrow = arrow
        # SQL rendering delegate (never executed via JDBC)
        self._renderer = JdbcResource(descriptor, url="dbapi://", table=table)

    def capabilities(self) -> Capability:
        return self._renderer.capabilities()

    def negotiate(self, request: ScanRequest) -> ScanPlan:
        return negotiate(request, self.capabilities())

    def render_query(self, plan: ScanPlan) -> str:
        return self._renderer.render_query(plan)

    def execute(self, spark: SparkSession, plan: ScanPlan) -> DataFrame:
        query = self.render_query(plan)
        con = self.connect()
        try:
            cur = con.execute(query)
            if self.arrow and hasattr(cur, "arrow"):
                tbl = cur.arrow()
                # explicit schema from the Arrow result: empty result
                # sets carry no inferable values, but always a schema
                from pyspark.sql.pandas.types import from_arrow_schema

                schema = from_arrow_schema(tbl.schema)
                df = spark.createDataFrame(tbl.to_pandas(), schema=schema)
            else:
                rows = cur.fetchall()
                cols = [d[0] for d in cur.description]
                df = spark.createDataFrame([tuple(r) for r in rows], schema=cols)
        finally:
            con.close()
        # the engine re-checks residuals even though the DB claims Exact
        from ..expressions.lowering import lower

        for p in plan.residual:
            df = df.filter(lower(p.expr))
        return df

    def scan(self, spark: SparkSession, request: ScanRequest) -> tuple[DataFrame, ScanPlan]:
        plan = self.negotiate(request)
        return self.execute(spark, plan), plan
