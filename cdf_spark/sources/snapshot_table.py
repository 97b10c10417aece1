"""Snapshot-pinned table source: Iceberg-shaped time travel over
parquet file manifests.

Re-expresses the reference's snapshot-pinned table scan
(`crates/cdf-source-iceberg/src/driver.rs:902-1060`): every commit
produces an immutable numbered snapshot whose manifest lists exactly
the data files visible at that snapshot; readers pin a snapshot id (or
a timestamp) and see that version forever, regardless of later commits.
No Iceberg jars ship in this image, so the table layout is a minimal
spec-shaped equivalent:

    <root>/metadata/v<N>.json   {"snapshot_id": N, "timestamp_ms": ...,
                                 "operation": "append"|"overwrite",
                                 "files": ["data/<uuid>.parquet", ...],
                                 "parent": N-1 | null}
    <root>/metadata/current     text file holding "N" (atomic rename swap)
    <root>/data/<uuid>.parquet  immutable data files (never rewritten)

Scale design: the manifest is driver-side metadata (tiny JSON); the
data path is a plain multi-file `spark.read.parquet(*files)` so
predicate pushdown, column pruning, and task splitting are Catalyst's.
Snapshot isolation comes from file immutability — exactly Iceberg's
core mechanism. Commits are lock-free for readers: the `current`
pointer swaps by atomic rename.

Integrates with the engine's position vocabulary via
:class:`cdf_spark.positions.TableSnapshotPosition`: an incremental
consumer checkpoints the snapshot id and reads only snapshots newer
than its position (`changes_since`).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..expressions.lowering import lower
from ..plans.scan import Capability, ScanPlan, ScanRequest, negotiate
from ..positions import TableSnapshotPosition
from .base import ResourceDescriptor


class SnapshotNotFound(LookupError):
    pass


class SnapshotTable:
    """A versioned parquet table with snapshot-pinned reads."""

    def __init__(self, root: str | Path, descriptor: ResourceDescriptor | None = None):
        self.root = Path(root)
        self.descriptor = descriptor or ResourceDescriptor(resource_id=self.root.name)
        (self.root / "metadata").mkdir(parents=True, exist_ok=True)
        (self.root / "data").mkdir(exist_ok=True)

    # -- metadata ---------------------------------------------------------
    def _snapshot_path(self, sid: int) -> Path:
        return self.root / "metadata" / f"v{sid}.json"

    def current_snapshot_id(self) -> int | None:
        cur = self.root / "metadata" / "current"
        if not cur.exists():
            return None
        return int(cur.read_text().strip())

    def snapshot(self, sid: int) -> dict:
        p = self._snapshot_path(sid)
        if not p.exists():
            raise SnapshotNotFound(f"snapshot {sid} does not exist under {self.root}")
        return json.loads(p.read_text())

    def snapshots(self) -> list[dict]:
        out = []
        sid = self.current_snapshot_id()
        while sid is not None:
            snap = self.snapshot(sid)
            out.append(snap)
            sid = snap.get("parent")
        return list(reversed(out))

    def snapshot_as_of(self, timestamp_ms: int) -> dict:
        """Latest snapshot committed at or before the timestamp."""
        eligible = [s for s in self.snapshots() if s["timestamp_ms"] <= timestamp_ms]
        if not eligible:
            raise SnapshotNotFound(f"no snapshot at or before {timestamp_ms}")
        return eligible[-1]

    def position(self) -> TableSnapshotPosition | None:
        sid = self.current_snapshot_id()
        return TableSnapshotPosition(snapshot_id=sid) if sid is not None else None

    # -- commits ----------------------------------------------------------
    def _commit(self, new_files: list[str], operation: str) -> int:
        parent = self.current_snapshot_id()
        sid = (parent or 0) + 1
        if operation == "append" and parent is not None:
            files = self.snapshot(parent)["files"] + new_files
        else:
            files = new_files
        snap = {
            "snapshot_id": sid,
            "parent": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "files": files,
            "added_files": new_files,
        }
        self._snapshot_path(sid).write_text(json.dumps(snap, indent=1))
        # atomic pointer swap: readers see the old or the new snapshot,
        # never a partial state
        tmp = self.root / "metadata" / f".current.{uuid.uuid4().hex[:8]}"
        tmp.write_text(str(sid))
        os.replace(tmp, self.root / "metadata" / "current")
        return sid

    def _write_files(self, df: DataFrame) -> list[str]:
        """Materialize a DataFrame as immutable uniquely-named files."""
        staging = self.root / f".staging-{uuid.uuid4().hex[:8]}"
        df.write.parquet(str(staging))
        out = []
        for p in sorted(staging.glob("*.parquet")):
            name = f"data/{uuid.uuid4().hex}.parquet"
            p.rename(self.root / name)
            out.append(name)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        return out

    def append(self, df: DataFrame) -> int:
        return self._commit(self._write_files(df), "append")

    def overwrite(self, df: DataFrame) -> int:
        return self._commit(self._write_files(df), "overwrite")

    # -- reads ------------------------------------------------------------
    def capabilities(self) -> Capability:
        cap = Capability.parquet()
        cap.position_enforced = True  # snapshot pin IS the position
        return cap

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
    ) -> DataFrame:
        """Pinned read: the file list is frozen at manifest time, so the
        frame sees the snapshot's data even if the table advances."""
        if snapshot_id is not None and as_of_timestamp_ms is not None:
            raise ValueError("pin either snapshot_id or as_of_timestamp_ms, not both")
        if as_of_timestamp_ms is not None:
            snap = self.snapshot_as_of(as_of_timestamp_ms)
        else:
            sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
            if sid is None:
                raise SnapshotNotFound(f"table {self.root} has no snapshots")
            snap = self.snapshot(sid)
        files = [str(self.root / f) for f in snap["files"]]
        if not files:
            raise SnapshotNotFound(f"snapshot {snap['snapshot_id']} is empty")
        return spark.read.parquet(*files)

    def scan(
        self,
        spark: SparkSession,
        request: ScanRequest,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
    ) -> tuple[DataFrame, ScanPlan]:
        """Negotiated scan against a pinned snapshot (same pushdown
        contract as FileResource — Catalyst pushes into the parquet
        scan; the plan records the pin for replay)."""
        plan = negotiate(request, self.capabilities())
        df = self.read(spark, snapshot_id=snapshot_id, as_of_timestamp_ms=as_of_timestamp_ms)
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
        if plan.order_by:
            from pyspark.sql import functions as F

            df = df.orderBy(
                *[F.col(o.field).asc() if o.ascending else F.col(o.field).desc() for o in plan.order_by]
            )
        if plan.limit is not None:
            df = df.limit(plan.limit)
        return df, plan

    def changes_since(self, spark: SparkSession, position: TableSnapshotPosition) -> tuple[DataFrame | None, TableSnapshotPosition]:
        """Incremental consumption: rows in files ADDED after the
        checkpointed snapshot (append-only tables; an overwrite resets
        lineage and forces a full re-read)."""
        cur = self.current_snapshot_id()
        if cur is None or cur <= position.snapshot_id:
            return None, position
        added: list[str] = []
        for snap in self.snapshots():
            if snap["snapshot_id"] <= position.snapshot_id:
                continue
            if snap["operation"] == "overwrite":
                return self.read(spark, snapshot_id=cur), TableSnapshotPosition(cur)
            added.extend(snap["added_files"])
        if not added:
            return None, TableSnapshotPosition(cur)
        return spark.read.parquet(*[str(self.root / f) for f in added]), TableSnapshotPosition(cur)
