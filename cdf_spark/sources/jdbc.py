"""JDBC resources: database table scans with exact pushdown.

Re-expresses the reference's SQL sources (Postgres
`crates/cdf-source-postgres/src/source.rs:373-430`, SQLite
`crates/cdf-source-sqlite/src/source.rs:276-330`, ClickHouse
`crates/cdf-source-clickhouse/src/resource.rs:254-300`): projection
Exact, comparison filters Exact, limit + order-by pushdown, row
estimates, cursor-incremental reads.

Spark shape: `spark.read.jdbc` with
- a pushed-down SQL query (projection + WHERE rendered from the
  negotiated plan — databases enforce predicates exactly, hence
  `Capability.jdbc()`), and
- partitioned parallelism via (partitionColumn, lowerBound,
  upperBound, numPartitions) so a big table reads as N concurrent
  range scans, the JDBC analogue of the reference's PartitionPlan.

No database ships in this container, so `read` requires a live URL at
runtime; plan rendering and SQL generation are fully unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..expressions.ast import Binary, Cast, Col, Expr, Lit, Unary
from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from .base import ResourceDescriptor

_SQL_OPS = {
    "eq": "=", "ne": "<>", "lt": "<", "le": "<=", "gt": ">", "ge": ">=",
    "and": "AND", "or": "OR", "add": "+", "sub": "-", "mul": "*", "div": "/",
}


def render_sql_predicate(expr: Expr) -> str:
    """Render an admitted AST predicate to portable SQL."""
    if isinstance(expr, Col):
        return f'"{expr.name}"'
    if isinstance(expr, Lit):
        v = expr.value
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"
    if isinstance(expr, Binary):
        op = _SQL_OPS.get(expr.op)
        if op is None:
            raise ValueError(f"operator {expr.op!r} not renderable for JDBC pushdown")
        return f"({render_sql_predicate(expr.left)} {op} {render_sql_predicate(expr.right)})"
    if isinstance(expr, Unary):
        if expr.op == "is_null":
            return f"({render_sql_predicate(expr.operand)} IS NULL)"
        if expr.op == "is_not_null":
            return f"({render_sql_predicate(expr.operand)} IS NOT NULL)"
        if expr.op == "not":
            return f"(NOT {render_sql_predicate(expr.operand)})"
        if expr.op == "neg":
            return f"(-{render_sql_predicate(expr.operand)})"
    raise ValueError(f"node {type(expr).__name__} not renderable for JDBC pushdown")


@dataclass
class JdbcPartitionSpec:
    column: str
    lower: int
    upper: int
    num_partitions: int = 8


class JdbcResource:
    def __init__(
        self,
        descriptor: ResourceDescriptor,
        url: str,
        table: str,
        partitioning: JdbcPartitionSpec | None = None,
        **options: str,
    ):
        self.descriptor = descriptor
        self.url = url
        self.table = table
        self.partitioning = partitioning
        self.options = options

    def capabilities(self) -> Capability:
        cap = Capability.jdbc()
        # a database's own cursor column IS position-enforced when the
        # engine rewrites the query from the resume value
        cap.position_enforced = True
        return cap

    def negotiate(self, request: ScanRequest) -> ScanPlan:
        return negotiate(request, self.capabilities())

    def render_query(self, plan: ScanPlan) -> str:
        """The exact SQL pushed to the database — recorded in the plan
        artifact for replay/audit."""
        cols = ", ".join(f'"{c}"' for c in plan.projection) if plan.projection else "*"
        sql = f'SELECT {cols} FROM {self.table}'
        preds = [render_sql_predicate(p.expr) for p in plan.pushed if not p.subsumed_by_position]
        # subsumed cursor predicates still render: the position IS the query
        preds += [render_sql_predicate(p.expr) for p in plan.pushed if p.subsumed_by_position]
        if preds:
            sql += " WHERE " + " AND ".join(preds)
        if plan.order_by:
            sql += " ORDER BY " + ", ".join(
                f'"{o.field}" {"ASC" if o.ascending else "DESC"}' for o in plan.order_by
            )
        if plan.limit is not None:
            sql += f" LIMIT {plan.limit}"
        return sql

    def execute(self, spark: SparkSession, plan: ScanPlan) -> DataFrame:
        query = self.render_query(plan)
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", query)
        )
        if self.partitioning and plan.limit is None and not plan.order_by:
            # partitioned range read (dbtable mode requires no LIMIT)
            reader = (
                spark.read.format("jdbc")
                .option("url", self.url)
                .option("dbtable", f"({query}) cdf_src")
                .option("partitionColumn", self.partitioning.column)
                .option("lowerBound", str(self.partitioning.lower))
                .option("upperBound", str(self.partitioning.upper))
                .option("numPartitions", str(self.partitioning.num_partitions))
            )
        for k, v in self.options.items():
            reader = reader.option(k, v)
        df = reader.load()
        # engine re-checks residuals even though JDBC claims Exact
        from ..expressions.lowering import lower

        for p in plan.residual:
            df = df.filter(lower(p.expr))
        return df

    def scan(self, spark: SparkSession, request: ScanRequest) -> tuple[DataFrame, ScanPlan]:
        plan = self.negotiate(request)
        return self.execute(spark, plan), plan
