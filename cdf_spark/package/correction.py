"""Addressed corrections: surgical fixes to already-committed data.

Re-expresses `crates/cdf-kernel/src/correction.rs:1-1186`: a
correction targets rows by key in a committed destination —
retract (delete), amend (update specific columns), or reinstate
(re-insert previously quarantined rows) — and commits through the
same receipt/checkpoint protocol so the audit chain stays unbroken.

Spark shape: corrections are keyed DataFrame surgery + staged rewrite
(the same merge machinery as CDC apply), with a correction record in
the ledger. Each correction is itself content-hashed.
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CorrectionSpec:
    kind: str                      # retract | amend | reinstate
    keys: list[str]
    key_values: list[dict] = field(default_factory=list)   # addressed rows
    amendments: dict[str, object] = field(default_factory=dict)  # amend: col -> new value

    def __post_init__(self):
        if self.kind not in ("retract", "amend", "reinstate"):
            raise ValueError(f"unknown correction kind {self.kind!r}")
        if self.kind == "amend" and not self.amendments:
            raise ValueError("amend correction requires amendments")

    def content_hash(self) -> str:
        js = json.dumps(
            {"kind": self.kind, "keys": self.keys, "rows": self.key_values, "amend": self.amendments},
            sort_keys=True, default=str,
        )
        return "sha256:" + hashlib.sha256(js.encode()).hexdigest()


@dataclass
class CorrectionReceipt:
    correction_id: str
    correction_hash: str
    kind: str
    rows_affected: int
    destination: str
    applied_at_ms: int


def apply_correction(
    spark: SparkSession,
    table_path: str | Path,
    spec: CorrectionSpec,
    reinstate_df: DataFrame | None = None,
    ledger_root: str | Path | None = None,
) -> CorrectionReceipt:
    """Apply an addressed correction to a parquet destination with a
    staged rewrite; record the correction in the ledger."""
    table_path = Path(table_path)
    target = spark.read.parquet(str(table_path))
    addressed = spark.createDataFrame(spec.key_values) if spec.key_values else None  # type: ignore[arg-type]

    if spec.kind == "retract":
        assert addressed is not None
        out = target.join(F.broadcast(addressed), on=spec.keys, how="left_anti")
        affected = target.count() - out.count()
    elif spec.kind == "amend":
        assert addressed is not None
        marked = target.join(
            F.broadcast(addressed.withColumn("_hit", F.lit(True))), on=spec.keys, how="left"
        )
        out = marked
        for col, value in spec.amendments.items():
            out = out.withColumn(col, F.when(F.col("_hit"), F.lit(value)).otherwise(F.col(col)))
        affected = out.filter(F.col("_hit")).count()
        out = out.drop("_hit")
        out = out.select(*target.columns)
    else:  # reinstate
        if reinstate_df is None:
            raise ValueError("reinstate requires the rows to re-insert")
        out = target.unionByName(reinstate_df.select(*target.columns))
        affected = reinstate_df.count()

    staging = table_path.with_name(table_path.name + ".staging")
    out.write.mode("overwrite").parquet(str(staging))
    spark.read.parquet(str(staging)).write.mode("overwrite").parquet(str(table_path))

    receipt = CorrectionReceipt(
        correction_id="cor-" + uuid.uuid4().hex[:16],
        correction_hash=spec.content_hash(),
        kind=spec.kind,
        rows_affected=affected,
        destination=str(table_path),
        applied_at_ms=int(time.time() * 1000),
    )
    if ledger_root is not None:
        p = Path(ledger_root) / "corrections.jsonl"
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a") as f:
            f.write(json.dumps(receipt.__dict__) + "\n")
    return receipt
