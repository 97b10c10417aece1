"""FrameResource: adapt an already-built DataFrame to the resource
scan protocol.

The glue that lets composite sources (snapshot-table `changes_since`
deltas, streaming micro-batches, subprocess adapters) ride the full
LoadPipeline — negotiation happens against parquet-grade capabilities
and the plan's projection/predicates are applied engine-side (Exact:
Catalyst collapses them into the underlying scan when the frame is a
file read, and enforces them as filters otherwise)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..expressions.lowering import lower
from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from .base import ResourceDescriptor


class FrameResource:
    def __init__(self, descriptor: ResourceDescriptor, df: DataFrame):
        self.descriptor = descriptor
        self.df = df

    def capabilities(self) -> Capability:
        cap = Capability.parquet()
        cap.position_enforced = True  # the frame IS the delta slice
        return cap

    def negotiate(self, request: ScanRequest) -> ScanPlan:
        return negotiate(request, self.capabilities())

    def execute(self, spark: SparkSession, plan: ScanPlan) -> DataFrame:
        df = self.df
        if plan.projection:
            df = df.select(*plan.projection)
        # pushed predicates re-apply row-level (these readers ARE the
        # engine — Spark's parquet pushdown rides the filter), and
        # UNSUPPORTED ones must apply too: negotiate() classifies
        # composite/unfamiliar shapes as unsupported for the SOURCE,
        # which obliges the engine to enforce them itself — silently
        # dropping them returned extra rows (caught by the delta
        # data-skipping tests, latent in five scan paths).
        for p in plan.pushed + plan.residual + plan.unsupported:
            df = df.filter(lower(p.expr))
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df

    def scan(self, spark: SparkSession, request: ScanRequest) -> tuple[DataFrame, ScanPlan]:
        plan = self.negotiate(request)
        return self.execute(spark, plan), plan
