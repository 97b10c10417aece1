"""Incremental LoadPipeline over snapshot-pinned tables.

The integration that makes the table-format readers (`IcebergTable`,
`DeltaTable`, `SnapshotTable`) first-class PIPELINE sources, not just
readers: each run consumes `changes_since(checkpointed position)`,
drives the delta through the full load path (contract -> dedup ->
package -> commit -> verify), and advances the ledger with the new
`TableSnapshotPosition` under the `_snapshot` positions key — so
consumption resumes exactly where the last verified commit left off,
and a failed run (unverified receipt) advances nothing.

Reference parity: `crates/cdf-source-iceberg/src/driver.rs:902-1060`
drives exactly this loop (snapshot selector -> incremental scan ->
commit with TableSnapshotPosition); here the loop composes the existing
LoadPipeline instead of re-implementing staging.

Scale: the delta DataFrame is a multi-file parquet scan of only the
newly-added files — the scan, contract, and package stages parallelize
over those files alone, never re-reading consumed history (except the
documented full re-read when an overwrite invalidates the consumer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession

from ..positions import TableSnapshotPosition
from .base import ResourceDescriptor, WriteDisposition
from .frame import FrameResource

POSITION_KEY = "_snapshot"


@dataclass
class SnapshotLoadPipeline:
    """Configured incremental load from a snapshot table."""

    table: object  # IcebergTable | DeltaTable | SnapshotTable (changes_since contract)
    descriptor: ResourceDescriptor
    ledger: object  # CheckpointLedger
    contract: object | None = None
    package_root: str = "/tmp/cdf_packages"
    destination: object | None = None
    disposition: WriteDisposition = WriteDisposition.APPEND
    predicates: list = field(default_factory=list)
    projection: list[str] | None = None

    def resume_position(self) -> Optional[TableSnapshotPosition]:
        raw = self.ledger.resume_position(self.descriptor.resource_id, POSITION_KEY)
        if raw is None:
            return None
        return TableSnapshotPosition(
            snapshot_id=int(raw["snapshot_id"]),
            sequence_number=(
                None if raw.get("sequence_number") is None else int(raw["sequence_number"])
            ),
        )

    def run(self, spark: SparkSession):
        """One incremental consumption round. Returns the LoadPipeline
        RunResult, or None when the table has no new commits (nothing
        read, nothing written, position untouched)."""
        from ..runtime import LoadPipeline

        prev = self.resume_position()
        df, new_pos = self.table.changes_since(spark, prev)
        if df is None:
            return None
        pipe = LoadPipeline(
            resource=FrameResource(self.descriptor, df),
            contract=self.contract,
            package_root=self.package_root,
            ledger=self.ledger,
            destination=self.destination,
            disposition=self.disposition,
            predicates=list(self.predicates),
            projection=self.projection,
            extra_positions={
                POSITION_KEY: {
                    "snapshot_id": int(new_pos.snapshot_id),
                    "sequence_number": new_pos.sequence_number,
                }
            },
        )
        return pipe.run(spark)
