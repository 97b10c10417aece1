"""Resource descriptors — the stateful extraction unit.

Re-expresses `ResourceDescriptor` (`crates/cdf-kernel/src/resource.rs:29-42`):
a resource is a named, keyed, optionally-cursored unit of extraction
with a write disposition, dedup policy, contract, and freshness
expectations. In the Spark build it is plain driver-side metadata; the
data path is always a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class WriteDisposition(str, Enum):
    """`crates/cdf-kernel/src/resource.rs:417-424` + delivery guarantees
    (`crates/cdf-kernel/src/destination.rs:427-433`)."""

    APPEND = "append"            # at-least-once, duplicate risk
    REPLACE = "replace"          # effectively-once per target
    MERGE = "merge"              # effectively-once per key
    CDC_APPLY = "cdc_apply"      # effectively-once per position

    @property
    def delivery_guarantee(self) -> str:
        return {
            WriteDisposition.APPEND: "at_least_once_duplicate_risk",
            WriteDisposition.REPLACE: "effectively_once_per_target",
            WriteDisposition.MERGE: "effectively_once_per_key",
            WriteDisposition.CDC_APPLY: "effectively_once_per_position",
        }[self]


@dataclass
class CursorSpec:
    """Incremental cursor (`CursorSpec`, resource.rs)."""

    field: str
    initial_value: object | None = None


@dataclass
class ResourceDescriptor:
    resource_id: str
    schema: dict[str, str] | None = None  # name -> canonical type (None = self-describing)
    primary_key: list[str] = field(default_factory=list)
    merge_key: list[str] = field(default_factory=list)
    cursor: CursorSpec | None = None
    write_disposition: WriteDisposition = WriteDisposition.APPEND
    dedup_keys: list[str] = field(default_factory=list)
    dedup_keep: str = "last"  # first | last | fail
    freshness_ms: int | None = None
    trust_level: str = "declared"  # declared | inferred
    options: dict[str, str] = field(default_factory=dict)
