"""Bounded preview + system-metadata SQL (`cdf preview` / `cdf sql`).

Re-expresses the inspection entry points (SURVEY §3.3):

- `preview()`: a bounded, deterministic look at a resource — row /
  byte / partition budgets (`EnginePreviewLimits`,
  `crates/cdf-engine/src/types.rs:2313-2341`), deterministic
  stratified sampling (§2.7), and rich evidence (rows scanned, limits
  hit, pushdown evidence) like `types.rs:2378-2401`.
- `system_sql()`: read-only SQL over the engine's OWN metadata
  (checkpoints, receipts, packages) — reference `cdf sql` runs over
  SQLite system tables (`crates/cdf-cli/src/system_sql.rs:16-31`)
  and refuses mutation (`:58-61`). We register the JSONL ledgers and
  package manifests as temp views and gate the statement to SELECT.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .operators.sampling import stratified_hash_sample
from .plans.scan import ScanRequest
from .sources.files import FileResource, pushdown_evidence


@dataclass
class PreviewLimits:
    max_rows: int = 1000
    sample_modulus: int = 100
    sample_keep: int | None = None  # None -> no sampling, plain limit


@dataclass
class PreviewResult:
    df: DataFrame
    rows_returned: int
    limit_hit: bool
    evidence: dict = field(default_factory=dict)


def preview(
    spark: SparkSession,
    resource: FileResource,
    request: ScanRequest | None = None,
    limits: PreviewLimits | None = None,
) -> PreviewResult:
    limits = limits or PreviewLimits()
    request = request or ScanRequest(resource.descriptor.resource_id)
    df, plan = resource.scan(spark, request)
    if limits.sample_keep:
        identity = resource.descriptor.primary_key or None
        df = stratified_hash_sample(
            df, identity, modulus=limits.sample_modulus, keep_buckets=limits.sample_keep
        )
    bounded = df.limit(limits.max_rows + 1)
    rows = bounded.count()
    limit_hit = rows > limits.max_rows
    out = df.limit(limits.max_rows)
    return PreviewResult(
        df=out,
        rows_returned=min(rows, limits.max_rows),
        limit_hit=limit_hit,
        evidence={
            "plan_hash": plan.content_hash(),
            "pushdown": {
                k: v for k, v in pushdown_evidence(out).items() if k != "plan"
            },
            "limits": {"max_rows": limits.max_rows, "sampled": bool(limits.sample_keep)},
        },
    )


class SystemSqlError(ValueError):
    pass


_MUTATION_KEYWORDS = (
    "insert", "update", "delete", "merge", "drop", "create", "alter",
    "truncate", "grant", "revoke", "copy", "attach", "set",
)


def system_sql(spark: SparkSession, ledger_root: str | Path, package_root: str | Path | None, sql: str) -> DataFrame:
    """Read-only SQL over checkpoints / receipts / packages views."""
    lowered = sql.strip().lower()
    first = lowered.split(None, 1)[0] if lowered else ""
    if first != "select" and not lowered.startswith("with"):
        raise SystemSqlError("system SQL admits SELECT statements only")
    for kw in _MUTATION_KEYWORDS:
        if f" {kw} " in f" {lowered} ":
            raise SystemSqlError(f"mutation keyword {kw!r} refused (system_sql.rs:58-61 parity)")

    ledger_root = Path(ledger_root)
    views = {}
    for name in ("checkpoints", "receipts", "corrections"):
        p = ledger_root / f"{name}.jsonl"
        if p.exists():
            views[name] = spark.read.json(str(p))
    if package_root is not None:
        manifests = list(Path(package_root).glob("*/manifest.json"))
        if manifests:
            rows = [json.loads(m.read_text()) for m in manifests]
            views["packages"] = spark.createDataFrame(rows)  # type: ignore[arg-type]
    if not views:
        raise SystemSqlError("no system tables found (no runs recorded yet)")
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
