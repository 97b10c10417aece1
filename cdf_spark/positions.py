"""Typed source positions and the aggregation algebra.

Re-expresses the reference's position vocabulary
(`crates/cdf-kernel/src/position.rs`, exports `lib.rs:133-140`):
CursorPosition, FilePosition/FileManifest, PageToken,
TableSnapshotPosition, PostgresCommitPosition (LSN),
MySqlCommitPosition (binlog), MongoChangeStreamResumeToken,
CompositePosition — and the per-kind merge algebra that folds
per-partition positions into one resource frontier
(`crates/cdf-kernel/src/position_aggregation.rs:1-1146`).

Positions are driver-side metadata riding on checkpoints; the algebra
is pure Python. Frontier semantics per kind:
  cursor / snapshot / lsn / binlog -> max (monotone scalar)
  file manifest                    -> set union of completed files
  page token                       -> latest token (ordered by page ordinal)
  composite                        -> field-wise merge
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class PositionMergeError(Exception):
    pass


@dataclass(frozen=True)
class CursorPosition:
    kind = "cursor"
    field_name: str
    value: Any

    def merge(self, other: CursorPosition) -> CursorPosition:
        if other.field_name != self.field_name:
            raise PositionMergeError("cursor fields differ")
        return self if (other.value is None or (self.value is not None and self.value >= other.value)) else other


@dataclass(frozen=True)
class TableSnapshotPosition:
    """Snapshot frontier. `sequence_number` is the Iceberg v2 commit
    ordinal — the ONLY monotone ordering on real Iceberg tables, whose
    snapshot ids are random 64-bit values (reference:
    `crates/cdf-source-iceberg/src/driver.rs` append_snapshot_ancestry
    validates ancestry + sequence numbers, not id order). The home-grown
    SnapshotTable layout has monotone ids and may omit it."""

    kind = "table_snapshot"
    snapshot_id: int
    sequence_number: int | None = None

    def merge(self, other: TableSnapshotPosition) -> TableSnapshotPosition:
        if self.sequence_number is not None and other.sequence_number is not None:
            return self if self.sequence_number >= other.sequence_number else other
        return self if self.snapshot_id >= other.snapshot_id else other


@dataclass(frozen=True)
class LsnPosition:
    """Postgres WAL LSN ('X/Y' hex) — `PostgresCommitPosition`."""

    kind = "pg_lsn"
    lsn: str

    def _num(self) -> int:
        hi, lo = self.lsn.split("/")
        return (int(hi, 16) << 32) | int(lo, 16)

    def merge(self, other: LsnPosition) -> LsnPosition:
        return self if self._num() >= other._num() else other


@dataclass(frozen=True)
class BinlogPosition:
    """MySQL binlog (file ordinal, offset) — `MySqlCommitPosition`."""

    kind = "mysql_binlog"
    file: str
    offset: int

    def _key(self):
        return (self.file, self.offset)

    def merge(self, other: BinlogPosition) -> BinlogPosition:
        return self if self._key() >= other._key() else other


@dataclass(frozen=True)
class PageToken:
    kind = "page_token"
    token: str
    ordinal: int = 0

    def merge(self, other: PageToken) -> PageToken:
        return self if self.ordinal >= other.ordinal else other


@dataclass(frozen=True)
class ResumeToken:
    """Mongo change-stream resume token (opaque, ordered lexically)."""

    kind = "resume_token"
    token: str

    def merge(self, other: ResumeToken) -> ResumeToken:
        return self if self.token >= other.token else other


@dataclass
class FileManifest:
    """Completed-file set; the frontier is the union. Replay skips
    members (`FilePosition`/`FileManifest`)."""

    kind = "file_manifest"
    completed: set[str] = field(default_factory=set)

    def merge(self, other: FileManifest) -> FileManifest:
        return FileManifest(completed=self.completed | other.completed)

    def contains(self, path: str) -> bool:
        return path in self.completed


@dataclass
class ForeignStatePosition:
    """Opaque checkpoint from a foreign protocol (Singer/Airbyte STATE):
    canonical-JSON blob addressed by sha256, ordered by emission index
    (protocol_stream parity: the LAST state emitted wins —
    `crates/cdf-subprocess/src/protocol.rs:61-71`)."""

    kind = "foreign_state"
    protocol: str
    blob: str  # canonical JSON text of the state value
    blob_sha256: str
    seq: int = 0  # emission index within the run

    def merge(self, other: ForeignStatePosition) -> ForeignStatePosition:
        if self.protocol != other.protocol:
            raise PositionMergeError(
                f"foreign-state protocol mismatch: {self.protocol} vs {other.protocol}"
            )
        return self if self.seq >= other.seq else other


@dataclass
class CompositePosition:
    parts: dict[str, Any] = field(default_factory=dict)
    kind = "composite"

    def merge(self, other: CompositePosition) -> CompositePosition:
        out = dict(self.parts)
        for k, v in other.parts.items():
            out[k] = out[k].merge(v) if k in out else v
        return CompositePosition(parts=out)


def aggregate_positions(partition_positions: list[Any]) -> Any:
    """Fold per-partition positions into the resource frontier.

    All positions must share a kind (`position_aggregation.rs` enforces
    kind homogeneity per resource)."""
    if not partition_positions:
        return None
    kinds = {p.kind for p in partition_positions}
    if len(kinds) > 1:
        raise PositionMergeError(f"mixed position kinds: {sorted(kinds)}")
    out = partition_positions[0]
    for p in partition_positions[1:]:
        out = out.merge(p)
    return out
