"""File resources: parquet / csv / json / ndjson over local or object store.

Re-expresses the reference's files source
(`crates/cdf-source-files/src/runtime.rs:845-1013`): glob discovery,
per-file partition plan, byte estimates, format-dependent pushdown
capability. Execution is a single declarative `spark.read` so Catalyst
performs projection pruning and parquet predicate pushdown; the
negotiated :class:`ScanPlan` records what was claimed and what the
engine re-checks.

Scale note: the partition manifest here is *evidence*; the actual
split into tasks is Spark's (`spark.sql.files.maxPartitionBytes`).
For 100 TB the critical properties are (a) predicate + projection
reach the parquet scan (verified by `pushdown_evidence`), and (b) no
driver-side file loop — discovery uses Spark's own listing.
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..expressions.lowering import lower
from ..plans.scan import Capability, PartitionPlan, ScanPlan, ScanRequest, negotiate
from ..types.schema import CanonicalSchema
from .base import ResourceDescriptor

_FORMAT_CAPS = {
    "parquet": Capability.parquet,
    "orc": Capability.parquet,
    "csv": Capability.text_format,
    "json": Capability.text_format,
    "ndjson": Capability.text_format,
    "text": Capability.text_format,
}


class FileResource:
    """A declarative file-backed resource."""

    def __init__(
        self,
        descriptor: ResourceDescriptor,
        path: str,
        format: str = "parquet",
        **read_options: str,
    ):
        if format not in _FORMAT_CAPS:
            raise ValueError(f"unsupported file format {format!r}")
        self.descriptor = descriptor
        self.path = path
        self.format = format
        self.read_options = dict(read_options)

    # -- negotiation ---------------------------------------------------------

    def capabilities(self) -> Capability:
        return _FORMAT_CAPS[self.format]()

    def negotiate(self, request: ScanRequest) -> ScanPlan:
        plan = negotiate(request, self.capabilities())
        plan.partitions = self._partition_plan()
        return plan

    def _partition_plan(self) -> PartitionPlan:
        """File manifest with byte estimates (local-fs globs only; on an
        object store Spark's listing owns this and the manifest is
        recorded lazily)."""
        units: list[dict] = []
        total = 0
        paths = _glob.glob(self.path) if any(ch in self.path for ch in "*?[") else [self.path]
        for p in sorted(paths):
            if os.path.isfile(p):
                sz = os.path.getsize(p)
                units.append({"path": p, "bytes": sz})
                total += sz
            elif os.path.isdir(p):
                for root, _, names in os.walk(p):
                    for n in sorted(names):
                        if n.startswith(("_", ".")):
                            continue
                        fp = os.path.join(root, n)
                        sz = os.path.getsize(fp)
                        units.append({"path": fp, "bytes": sz})
                        total += sz
        return PartitionPlan(kind="files", units=units, estimated_bytes=total or None)

    # -- execution -----------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("json" if self.format == "ndjson" else self.format)
        if self.descriptor.schema:
            reader = reader.schema(CanonicalSchema.from_declared(self.descriptor.schema).to_spark())
        elif self.format == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        for k, v in self.read_options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)

    def execute(self, spark: SparkSession, plan: ScanPlan) -> DataFrame:
        """Lower a negotiated plan to a DataFrame. All predicates —
        pushed or not — are applied declaratively; Catalyst pushes what
        the format supports and re-checks the rest, which exactly
        matches the fidelity ledger's claim."""
        df = self.read(spark)
        for pred in plan.pushed:
            if not pred.subsumed_by_position:
                df = df.filter(lower(pred.expr))
        for expr in (p.expr for p in plan.unsupported):
            df = df.filter(lower(expr))
        # residuals for inexact-pushed predicates are the same exprs we
        # just applied; Spark's post-scan Filter node IS the re-check.
        if plan.projection:
            df = df.select(*plan.projection)
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df

    def scan(self, spark: SparkSession, request: ScanRequest) -> tuple[DataFrame, ScanPlan]:
        plan = self.negotiate(request)
        df = self.execute(spark, plan)
        plan.schema_fingerprint = CanonicalSchema.from_spark(df.schema).fingerprint()
        return df, plan


def pushdown_evidence(df: DataFrame) -> dict:
    """Extract PushedFilters / ReadSchema evidence from the formatted
    physical plan — the Spark-native analogue of the reference's
    negotiated-scan validation (`planning.rs:177`). Used by tests to
    assert that filters and projection actually reached the scan."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan_text = df._jdf.queryExecution().explainString(mode)
    evidence: dict = {"pushed_filters": [], "read_schema": None, "plan": plan_text}
    m = re.search(r"PushedFilters:\s*\[(.*?)\]", plan_text)
    if m and m.group(1).strip():
        evidence["pushed_filters"] = [s.strip() for s in m.group(1).split(",")]
    m = re.search(r"ReadSchema:\s*(\S+)", plan_text)
    if m:
        evidence["read_schema"] = m.group(1)
    return evidence
