"""Destination commits, receipts, and the checkpoint ledger.

Re-expresses the reference's commit protocol
(`DestinationProtocol::plan_commit -> CommitSession -> verify(receipt)`,
`crates/cdf-kernel/src/destination.rs:370-410`) and the append-only
checkpoint (`crates/cdf-kernel/src/checkpoint.rs:1-454`): a package
commits into a destination under a write disposition; the destination
returns a receipt; the checkpoint advances ONLY after the receipt
verifies. Positions (cursors/frontiers) ride on the checkpoint.

Without Delta in this image, destinations are parquet directories:
  append   -> write new files into the table dir (at-least-once)
  replace  -> overwrite the table dir (effectively-once per target)
  merge    -> null-safe keyed merge, rewrite (effectively-once per key)
The honest delivery guarantee is recorded on every receipt
(`crates/cdf-kernel/src/destination.rs:427-433`).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.base import WriteDisposition
from .builder import PackageResult
from .stats import dataset_value_hash


@dataclass
class Receipt:
    receipt_id: str
    package_id: str
    destination: str
    disposition: str
    delivery_guarantee: str
    rows_written: int
    value_hash: str
    committed_at_ms: int
    verified: bool = False


@dataclass
class CheckpointEntry:
    checkpoint_id: str
    resource_id: str
    package_id: str
    receipt_id: str
    positions: dict = field(default_factory=dict)
    created_at_ms: int = 0


class ParquetDestination:
    """A parquet-directory destination speaking the commit protocol."""

    def __init__(self, table_path: str | Path, merge_keys: list[str] | None = None):
        self.table_path = Path(table_path)
        self.merge_keys = merge_keys or []

    def commit(
        self,
        spark: SparkSession,
        package: PackageResult,
        disposition: WriteDisposition = WriteDisposition.APPEND,
    ) -> Receipt:
        rows = package.rows_admitted

        if disposition is WriteDisposition.APPEND:
            self._copy_segments(package, clear_first=False)
        elif disposition is WriteDisposition.REPLACE:
            self._copy_segments(package, clear_first=True)
        elif disposition is WriteDisposition.MERGE:
            df = spark.read.parquet(package.data_path())
            if not self.merge_keys:
                raise ValueError("merge disposition requires merge_keys")
            self._merge(spark, df)
        else:
            raise ValueError(f"disposition {disposition} not supported by ParquetDestination")

        return Receipt(
            receipt_id="rcp-" + uuid.uuid4().hex[:16],
            package_id=package.package_id,
            destination=str(self.table_path),
            disposition=disposition.value,
            delivery_guarantee=disposition.delivery_guarantee,
            rows_written=rows,
            value_hash=package.value_hash,
            committed_at_ms=int(time.time() * 1000),
        )

    def _copy_segments(self, package: PackageResult, clear_first: bool) -> None:
        """Package segments are already canonical parquet — commit by
        file copy (the reference's bulk `canonical_segment_scan` path:
        no decode/re-encode, bounded by device write). Segment names
        are prefixed with the package id so appends never collide and
        replays are idempotent per (package, segment)."""
        import shutil

        src = Path(package.data_path())
        if clear_first and self.table_path.exists():
            shutil.rmtree(self.table_path)
        self.table_path.mkdir(parents=True, exist_ok=True)
        for seg in sorted(src.glob("*.parquet")):
            shutil.copy2(seg, self.table_path / f"{package.package_id}-{seg.name}")

    def _merge(self, spark: SparkSession, staged: DataFrame) -> None:
        """Null-safe keyed merge: target rows whose key appears in the
        staged batch are replaced (DELETE..USING + INSERT,
        `crates/cdf-dest-duckdb/src/commit.rs:150-216`). The rewrite is
        near-atomic: the merged table is fully materialized in a staging
        dir, the live dir is renamed aside, staging renames into place,
        and only then is the old copy deleted — at every instant a
        complete copy of the table exists on disk."""
        if self.table_path.exists():
            target = spark.read.parquet(str(self.table_path))
            keys = staged.select(*self.merge_keys).distinct()
            cond = [target[k].eqNullSafe(keys[k]) for k in self.merge_keys]
            joined = cond[0]
            for c in cond[1:]:
                joined = joined & c
            survivors = target.join(F.broadcast(keys), on=joined, how="left_anti")
            merged = survivors.unionByName(staged)
        else:
            merged = staged
        tmp = self.table_path.with_name(self.table_path.name + ".staging")
        merged.write.mode("overwrite").parquet(str(tmp))
        import shutil

        old = self.table_path.with_name(self.table_path.name + f".old-{uuid.uuid4().hex[:8]}")
        if self.table_path.exists():
            self.table_path.rename(old)
        try:
            tmp.rename(self.table_path)
        except OSError:
            # roll back: restore the live table, keep staging for forensics
            if old.exists() and not self.table_path.exists():
                old.rename(self.table_path)
            raise
        if old.exists():
            shutil.rmtree(old)

    def verify(self, spark: SparkSession, receipt: Receipt, package: PackageResult) -> Receipt:
        """Receipt verification: the committed destination must contain
        exactly the package's rows (append: at least; replace: exactly)."""
        df = spark.read.parquet(str(self.table_path))
        if receipt.disposition == WriteDisposition.REPLACE.value:
            ok = dataset_value_hash(df) == package.value_hash
        elif receipt.disposition == WriteDisposition.MERGE.value:
            # null-safe containment check, same predicate as _merge —
            # a NULL key component must still count as present
            staged = spark.read.parquet(package.data_path())
            cond = [staged[k].eqNullSafe(df[k]) for k in self.merge_keys]
            joined_cond = cond[0]
            for c in cond[1:]:
                joined_cond = joined_cond & c
            ok = staged.join(df, on=joined_cond, how="left_anti").isEmpty()
        else:  # append: package rows all present (by count of key-hash)
            ok = df.count() >= receipt.rows_written
        receipt.verified = bool(ok)
        return receipt


class CheckpointLedger:
    """Append-only JSONL checkpoint + receipts ledger.

    Typed state transitions commit only after receipt verification
    (`checkpoint.rs`): `advance()` refuses unverified receipts.
    """

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.checkpoints = self.root / "checkpoints.jsonl"
        self.receipts = self.root / "receipts.jsonl"

    def record_receipt(self, receipt: Receipt) -> None:
        with open(self.receipts, "a") as f:
            f.write(json.dumps(asdict(receipt)) + "\n")

    def advance(self, resource_id: str, receipt: Receipt, positions: dict | None = None) -> CheckpointEntry:
        if not receipt.verified:
            raise ValueError("checkpoint refused: receipt not verified (destination.rs:370-410 parity)")
        entry = CheckpointEntry(
            checkpoint_id="ckp-" + uuid.uuid4().hex[:16],
            resource_id=resource_id,
            package_id=receipt.package_id,
            receipt_id=receipt.receipt_id,
            positions=positions or {},
            created_at_ms=int(time.time() * 1000),
        )
        with open(self.checkpoints, "a") as f:
            f.write(json.dumps(asdict(entry)) + "\n")
        return entry

    def epoch_committed(self, resource_id: str, epoch_id: int) -> bool:
        """True when this stream epoch already checkpointed — the
        foreachBatch exactly-once guard. Spark re-invokes foreachBatch
        with the SAME epoch id when a crash lands between the sink
        commit and the offset commit; a checkpointed epoch must be
        skipped, not committed twice (the batchId-dedup discipline
        every idempotent foreachBatch sink uses)."""
        if not self.checkpoints.exists():
            return False
        with open(self.checkpoints) as f:
            for line in f:
                obj = json.loads(line)
                if (
                    obj["resource_id"] == resource_id
                    and obj.get("positions", {}).get("epoch") == int(epoch_id)
                ):
                    return True
        return False

    def latest(self, resource_id: str) -> CheckpointEntry | None:
        if not self.checkpoints.exists():
            return None
        last = None
        with open(self.checkpoints) as f:
            for line in f:
                obj = json.loads(line)
                if obj["resource_id"] == resource_id:
                    last = CheckpointEntry(**obj)
        return last

    def resume_position(self, resource_id: str, field: str):
        ck = self.latest(resource_id)
        if ck is None:
            return None
        return ck.positions.get(field)
