"""Driver contract for the cdf_spark engine.

- ``entry(spark)``: flagship query (contract-validated scan feeding the
  TPC-H Q1 pricing summary) on sf0.001.
- ``queries()``: the full operator inventory from SURVEY §2 plus the
  beyond-reference relational and training-data surface — each entry
  implemented through cdf_spark's public API.
- ``oracle_sql()``: DuckDB-equivalent ANSI SQL per query (omitted only
  for approximate/engine-defined ops, which get rows-only checks).

See cdf_spark/queries.py for the implementations and the determinism
rules that make Spark and DuckDB hash-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF001 = "/root/testdata/sf0.001"


def _pin_session(spark: SparkSession) -> None:
    """Confs the engine depends on, applied defensively in case the
    driver's session was built without them (all runtime-settable)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: negotiated scan -> contract verdict split -> Q1 pricing
    summary over admitted rows."""
    _pin_session(spark)
    from pyspark.sql import functions as F

    from cdf_spark.contracts import Contract, DomainRule, NullabilityRule, RangeRule, evaluate_contract
    from cdf_spark.expressions.ast import Col
    from cdf_spark.plans.scan import ScanRequest
    from cdf_spark.sources import FileResource, ResourceDescriptor

    res = FileResource(ResourceDescriptor(resource_id="lineitem"), f"{SF001}/lineitem.parquet")
    df, _plan = res.scan(
        spark,
        ScanRequest(
            "lineitem",
            predicates=[Col("l_shipdate") <= "1998-09-02"],
        ),
    )
    contract = Contract(
        rules=[
            NullabilityRule("l_orderkey"),
            RangeRule("l_quantity", min=0.0, max=100.0),
            DomainRule("l_returnflag", ["A", "N", "R"]),
        ]
    )
    admitted = evaluate_contract(df, contract).admitted
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return admitted.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
        F.sum(disc.cast("decimal(38,6)")).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdf_spark import queries as q

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    from cdf_spark import queries as q

    return q.oracle_sql()
